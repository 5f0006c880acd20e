"""Pure-Python reference implementation ("oracle") of the Vector
pipeline semantics — dict-per-event loops mimicking the cited kernels
(SURVEY.md §5's rebuild test plan). Deliberately naive: correctness
reference only.
"""

from __future__ import annotations

from collections import defaultdict

SEVERITY_LANES = {"ERROR", "FATAL"}
WEBISH = {"web", "proxy"}


def route_oracle(rows: list[dict]) -> dict[str, set[str]]:
    """Per-lane doc_id sets under parallel multi-match lane semantics
    (route.rs:101-120)."""
    lanes = {"errors": set(), "bigdocs": set(), "webish": set(), "_unmatched": set()}
    for r in rows:
        matched = False
        if r["true_severity"] in SEVERITY_LANES:
            lanes["errors"].add(r["doc_id"])
            matched = True
        if r["n_tok"] >= 256:
            lanes["bigdocs"].add(r["doc_id"])
            matched = True
        if r["source"] in WEBISH:
            lanes["webish"].add(r["doc_id"])
            matched = True
        if not matched:
            lanes["_unmatched"].add(r["doc_id"])
    return lanes


def sink_metrics_oracle(rows: list[dict], doc_ids: set[str]) -> dict[tuple, tuple]:
    """Per-sink groupBy(source, severity) → (count, sum_n_tok)
    (the log_to_metric → aggregate pair, aggregate.rs:72-107)."""
    counts = defaultdict(lambda: [0, 0])
    for r in rows:
        if r["doc_id"] in doc_ids:
            key = (r["source"], r["true_severity"])
            counts[key][0] += 1
            counts[key][1] += r["n_tok"]
    return {k: tuple(v) for k, v in counts.items()}


def dedupe_oracle(rows: list[dict], match: list[str]) -> set[str]:
    """First-seen-wins dedupe by ts order (dedupe.rs:155-163 with a
    deterministic order instead of arrival)."""
    seen = set()
    keep = set()
    for r in sorted(rows, key=lambda r: (r["ts"], r["doc_id"])):
        key = tuple(str(r[f]) for f in match)
        if key not in seen:
            seen.add(key)
            keep.add(r["doc_id"])
    return keep


def reduce_oracle(rows: list[dict], group_by: str, field: str):
    """Merge-strategy golden per group (merge_strategy.rs:9-21)."""
    groups = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["ts"], r["doc_id"])):
        groups[r[group_by]].append(r[field])
    out = {}
    for g, vals in groups.items():
        out[g] = {
            "discard": vals[0],
            "retain": vals[-1],
            "sum": sum(vals) if isinstance(vals[0], (int, float)) else None,
            "max": max(vals),
            "min": min(vals),
            "array": vals,
            "concat": " ".join(str(v) for v in vals),
        }
    return out

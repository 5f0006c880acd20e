from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from vector_spark.session import get_spark

    s = get_spark("pytest", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus(spark):
    """Small deterministic corpus shared across tests (FIXTURES F1)."""
    from vector_spark.corpus import sequences

    return sequences(spark, 1200, seed=42).cache()


@pytest.fixture(scope="session")
def corpus_rows(corpus):
    """The same corpus collected for Python-oracle computations."""
    return [r.asDict() for r in corpus.collect()]

"""VRL front-end: lexer → parser → Column compiler.

Compiles real VRL source text (the language consumed by the reference's
`remap` transform, /root/reference/src/transforms/remap.rs:21-29, and by
`vrl`-type conditions) into PySpark Column expressions — the same
compile-to-Column architecture as functions/datadog_search.py, scaled up
to a statement language.

Execution model: one VRL program run per event becomes ONE declarative
select over the DataFrame. Statements thread a compile-time environment
(event paths / variables → typed Column expressions); control flow
(`if`, `abort`, runtime errors) becomes `F.when` guards; the reference's
rollback contract (remap.rs:130-148 — a failed or aborted program leaves
the ORIGINAL event untouched) becomes a per-field
when(rollback, original).otherwise(new) wrapper. Everything stays inside
whole-stage codegen; there is no per-row Python.

Public API:
    compile_program(source, schema)   -> CompiledProgram (.apply(df))
    compile_condition(source, schema) -> Column (boolean)
"""

from vector_spark.vrl.compiler import (
    CompiledProgram,
    VrlCompileError,
    compile_condition,
    compile_program,
)
from vector_spark.vrl.lexer import VrlSyntaxError

__all__ = [
    "CompiledProgram",
    "VrlCompileError",
    "VrlSyntaxError",
    "compile_condition",
    "compile_program",
]

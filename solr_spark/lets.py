"""let()-scope composition layer — the math-expression workspace.

Solr's math expressions run inside ``let(a=..., b=..., expr)``: each
variable binds the result of a stream or evaluator, later expressions
read earlier bindings, and a per-request object cache
(putCache/getCache/removeCache/listCache) carries values across
requests.  Reference:
  solrj-streaming io/stream/LetStream.java:1 (variable scope,
  sequential evaluation),
  io/eval/MemsetEvaluator.java:1 (stream → named column arrays),
  io/eval/PutCacheEvaluator.java:1 / GetCacheEvaluator.java /
  RemoveCacheEvaluator.java / ListCacheEvaluator.java
  (workspace→key→value object cache),
  io/eval/GetValueEvaluator.java ("get"), TupleEvaluator ("tuple"),
  EchoStream ("echo"), ColumnEvaluator ("col").

Scale contract: the let scope is DRIVER-SIDE BY DESIGN — in the
reference the whole math-expression workspace lives on one node.  The
Spark-first translation keeps every *stream* distributed (a binding can
hold a DataFrame without materializing it); only ``memset``/``col`` —
the reference's own explicit bring-to-memory operators — collect, and
they collect exactly the columns (and optionally the row-count cap
``size``) the user names, never whole frames.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

# Hard ceiling on rows an un-sized memset() may bring to the driver —
# the reference's let() arrays are "small in-memory vectors" by usage;
# anything larger is a driver OOM waiting to happen, so the collect is
# limit-capped Spark-side and over-cap raises (see memset()).
MEMSET_MAX_ROWS = 1_000_000


class LetContext:
    """One let() scope: ordered variable bindings + the object cache."""

    def __init__(self) -> None:
        self.vars: dict[str, Any] = {}
        self._cache: dict[str, dict[str, Any]] = {}

    # -- variable scope (LetStream) -------------------------------------
    def let(self, **bindings: Any) -> "LetContext":
        """Bind variables in order.  A value may be a callable taking the
        context (so later bindings can read earlier ones, like the
        reference's sequential LetStream evaluation) or any plain value
        — including a DataFrame, which stays lazy/distributed."""
        for name, value in bindings.items():
            self.vars[name] = value(self) if callable(value) else value
        return self

    def get(self, name: str) -> Any:
        """get(name) — GetValueEvaluator: read a bound variable."""
        if name not in self.vars:
            raise KeyError(f"let variable {name!r} is not bound")
        return self.vars[name]

    # -- memset (MemsetEvaluator) ---------------------------------------
    def memset(
        self,
        df: DataFrame,
        cols: list[str],
        vars: list[str],
        size: int = -1,
    ) -> "LetContext":
        """Materialize ``cols`` of a stream into driver lists bound to
        ``vars`` (optionally capped at ``size`` rows).  Mirrors
        MemsetEvaluator: one pass over the stream, one array per column.
        Only the named columns cross to the driver — the projection is
        pushed into the scan."""
        if len(cols) != len(vars):
            raise ValueError("memset: cols and vars must align 1:1")
        sel = df.select(*cols)
        if size > 0:
            sel = sel.limit(size)
        else:
            # let()-scope arrays are driver memory by contract, but an
            # unbounded collect over a corpus-scale stream is a driver
            # OOM, not a semantics mirror — cap Spark-side (limit before
            # the collect, same pattern as classify's max_vocab) and
            # raise actionably when the stream exceeds it.
            sel = sel.limit(MEMSET_MAX_ROWS + 1)
        rows = sel.collect()
        if size <= 0 and len(rows) > MEMSET_MAX_ROWS:
            raise ValueError(
                f"memset: stream exceeds MEMSET_MAX_ROWS={MEMSET_MAX_ROWS} "
                "driver-array rows; pass an explicit size= cap or "
                "aggregate the stream before memset()"
            )
        for c, v in zip(cols, vars):
            self.vars[v] = [r[c] for r in rows]
        return self

    # -- col (ColumnEvaluator): list-of-tuples → one column list --------
    @staticmethod
    def col(tuples: list[dict], name: str) -> list:
        return [t.get(name) for t in tuples]

    # -- tuple / echo ----------------------------------------------------
    def tuple(self, **fields: Any) -> dict[str, Any]:
        """tuple(a=..., b=...) — one output tuple of evaluated fields."""
        return {k: (v(self) if callable(v) else v) for k, v in fields.items()}

    @staticmethod
    def echo(text: str) -> dict[str, str]:
        """echo(text) — EchoStream: a single tuple carrying the text."""
        return {"echo": text}

    # -- object cache (Put/Get/Remove/ListCacheEvaluator) ---------------
    def put_cache(self, space: str, key: str, value: Any) -> Any:
        self._cache.setdefault(space, {})[key] = value
        return value

    def get_cache(self, space: str, key: str) -> Any:
        return self._cache.get(space, {}).get(key)

    def remove_cache(self, space: str, key: str) -> Any:
        return self._cache.get(space, {}).pop(key, None)

    def list_cache(self, space: str | None = None) -> list[str]:
        """No arg → workspace names; with a workspace → its keys."""
        if space is None:
            return sorted(self._cache)
        return sorted(self._cache.get(space, {}))


def run_let(
    bindings: dict[str, Any],
    body: Callable[[LetContext], Any],
    ctx: LetContext | None = None,
) -> Any:
    """Evaluate ``body`` inside a scope with ``bindings`` — the
    expression form ``let(a=..., b=..., expr)``."""
    ctx = ctx or LetContext()
    ctx.let(**bindings)
    return body(ctx)


def get_attribute(tup: dict, name: str) -> Any:
    """getAttribute(tuple, name) (GetAttributeEvaluator — reads one
    attribute off a model/result tuple)."""
    return tup.get(name)


def get_attributes(tup: dict) -> dict:
    """getAttributes(tuple) (GetAttributesEvaluator — the full
    attribute map of a model/result tuple)."""
    return dict(tup)


def list_streams(*frames):
    """list(a, b, ...) (ListStream — concatenate result streams in
    order). DataFrames with a shared schema union by name; Spark
    executes the branches in parallel regardless, so plist() (the
    reference's parallel variant) is the same plan."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


# plist(...) (PlistStream): identical plan — parallelism is Spark's job,
# not the operator's.
plist = list_streams

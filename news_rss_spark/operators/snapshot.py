"""Corpus snapshot diff — the data-ops primitive behind incremental
pipelines: given two versions of a table, classify every id as
added / removed / changed, so downstream stages (re-embedding, re-dedup,
index refresh) process ONLY the delta instead of the full corpus.

Plan: each side collapses to ``(id, content_hash)`` during its own scan
(md5 over the compared columns — column-pruned, map-side), then one
full-outer sort-merge join on the id.  Unchanged rows are filtered out
AFTER the join but BEFORE any wide result materializes, so the output is
delta-sized.  At 100 TB: if both snapshots are written bucketed by the
id (the engine's sink layout, plans/pipeline.py), the join needs no
exchange at all — the zero-Exchange bucketed-join proof in
tests/test_plans.py is exactly this shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _content_hash(cols: list[str]) -> F.Column:
    """Order-stable md5 over the compared columns.  Each column is
    hashed FIRST and the fixed-width digests concatenated — a raw
    separator-join is ambiguous when a value itself contains the
    separator (("a\\x01b", "c") vs ("a", "b\\x01c") would collide), and
    any sentinel string for NULL can be forged by a real value.  'n' is
    unforgeable here because every non-null slot is exactly 32 hex
    chars."""
    parts = [F.coalesce(F.md5(F.col(c).cast("string")), F.lit("n"))
             for c in cols]
    return F.md5(F.concat(*parts))


def snapshot_diff(old: DataFrame, new: DataFrame,
                  id_col: str = "doc_id",
                  content_cols: list[str] | None = None) -> DataFrame:
    """``(id_col, change, old_hash, new_hash)`` with change in
    {'added', 'removed', 'changed'}; unchanged ids are dropped.

    ``content_cols`` defaults to every non-id column the two snapshots
    share (schema drift: a column only one side has would make every row
    'changed', so it must be listed explicitly to count).
    """
    if content_cols is None:
        content_cols = sorted((set(old.columns) & set(new.columns))
                              - {id_col})
    o = old.select(F.col(id_col), _content_hash(content_cols).alias("old_hash"))
    n = new.select(F.col(id_col), _content_hash(content_cols).alias("new_hash"))
    joined = o.join(n, on=id_col, how="full_outer")
    change = (F.when(F.col("old_hash").isNull(), F.lit("added"))
              .when(F.col("new_hash").isNull(), F.lit("removed"))
              .when(F.col("old_hash") != F.col("new_hash"),
                    F.lit("changed")))
    return (joined.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(id_col, "change", "old_hash", "new_hash"))


def apply_delta(old: DataFrame, new: DataFrame,
                id_col: str = "doc_id",
                content_cols: list[str] | None = None,
                materialize: bool = True
                ) -> tuple[DataFrame, DataFrame]:
    """The delta a MERGE-style sink consumes: ``(upserts, deletes)`` —
    upserts are the NEW rows for added+changed ids (full rows, ready for
    ``plans/iceberg.py`` merge_into / dynamic-overwrite), deletes the
    removed ids.  Both are delta-sized semi/anti joins against the diff,
    which is materialized ONCE by default — consuming both outputs would
    otherwise re-run the two snapshot scans and the full-outer join per
    output.  Pass ``materialize=False`` to stay fully lazy (e.g. when a
    guard may consume neither output)."""
    d = snapshot_diff(old, new, id_col, content_cols)
    if materialize:
        d = d.localCheckpoint(eager=True)
    upsert_ids = d.filter(F.col("change").isin("added", "changed")) \
        .select(id_col)
    delete_ids = d.filter(F.col("change") == "removed").select(id_col)
    return (new.join(upsert_ids, on=id_col, how="left_semi"),
            delete_ids)

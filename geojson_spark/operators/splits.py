"""Dataset splitting and cross-corpus contamination — training-pipeline
operators over the documents table.

Both are pure built-in Column/join pipelines (no Python on the hot path)
and keep to SQL-reproducible primitives (md5, integer arithmetic) so a
DuckDB oracle checks them bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_unit(key: Column, seed: int | str) -> Column:
    """Deterministic uniform value in [0, 2^32) from md5(key ':' seed) —
    the stable-across-runs/cluster-sizes alternative to rand(): a row's
    split never changes when the table is repartitioned or grown, which
    is what makes incremental dataset refreshes reproducible. ``seed``
    may be a string to DOMAIN-SEPARATE different consumers (sampling vs
    splitting) — two operators hashing the same key with the same integer
    seed would be perfectly correlated, not independent."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def hash_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/…) by hashing its
    id — deterministic, order-independent, cluster-size-independent.

    ``weights`` maps split name → fraction (normalized internally; dict
    order fixes the threshold order). One Column expression: md5 → 32-bit
    integer → cumulative-weight thresholds. No shuffle at all.

    A NULL id has no hash, so every threshold comparison is NULL — such
    rows are routed DELIBERATELY to the FIRST split (train by default):
    id-less rows are corrupt, and quietly concentrating them in the last
    split (previously 'test', via the CASE fall-through) would contaminate
    the most eval-sensitive split.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    u = _hash_unit(F.col(id_col), seed)
    scale = float(1 << 32)
    items = list(weights.items())
    expr = F.when(F.col(id_col).isNull(), F.lit(items[0][0]))
    acc = 0.0
    for name, wgt in items[:-1]:
        acc += wgt / total
        expr = expr.when(u < int(acc * scale), F.lit(name))
    expr = expr.otherwise(F.lit(items[-1][0]))
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    *,
    strata_col: str,
    fractions: dict,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5-hash
    unit falls under its stratum's fraction — the reproducible
    alternative to ``sampleBy`` (a row's fate never changes with
    partitioning, cluster size, or table growth, so incremental refreshes
    are stable). Strata missing from ``fractions`` are dropped. Pure
    Column expression; no shuffle, no RNG state.

    The hash is domain-separated from :func:`hash_split`'s
    (``md5(id ':sample:' seed)`` vs ``md5(id ':' seed)``): with a shared
    derivation and equal seeds, sampling would be perfectly correlated
    with split assignment — e.g. sampling the 'test' split at frac ≤
    1 − test-threshold would return ZERO rows, a silent severe bias.
    """
    scale = float(1 << 32)
    u = _hash_unit(F.col(id_col), f"sample:{seed}")
    expr = None
    for stratum, frac in fractions.items():
        cond = (F.col(strata_col) == F.lit(stratum)) & (u < int(float(frac) * scale))
        expr = cond if expr is None else expr | cond
    if expr is None:
        expr = F.lit(False)
    return df.where(expr)


def contamination_check(
    train: DataFrame,
    test: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
) -> DataFrame:
    """Per test document: how many of its k-word shingles appear anywhere
    in the train corpus — the standard train/test decontamination signal.

    Returns (doc_id, n_shingles, n_contaminated) — integer outputs, so a
    SQL oracle reproduces them exactly.

    Scale path: the train side reduces to its DISTINCT shingle set before
    the join (one agg; at web scale this is the smaller, heavily-deduped
    side), then a shuffle equi-join on the shingle string counts matches
    per test doc. No crossJoin, no Python; both sides shuffle only
    (shingle, id) pairs.
    """
    from geojson_spark.operators.dedup import _shingle_sets

    test_sh = _shingle_sets(test, id_col, text_col, k_shingle).select(
        F.col("id"), F.explode("sh").alias("w")
    )
    train_sh = (
        _shingle_sets(train, id_col, text_col, k_shingle)
        .select(F.explode("sh").alias("w"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = test_sh.join(train_sh, "w", "left")
    return (
        joined.groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    *,
    capacity: int,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy in-order sample packing: within each shard, documents (in
    ``id_col`` order) accumulate into bins of ``capacity`` tokens; a
    document that would overflow a non-empty bin starts the next bin
    (oversized documents get a bin of their own). Returns
    (id, shard, bin_no) — the standard sequence-packing step before LLM
    training.

    Scale path: packing is inherently a sequential fold, so it runs
    per-shard via applyInPandas — one shuffle on the shard key, O(shard)
    state, shards bounded by construction (a shard is a training-file
    unit). The fold itself is NumPy cumsum-free but trivially linear.
    A global (shard-free) packing would serialize on one task — that's a
    property of the problem, not the plan; choose shard granularity
    accordingly.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(shard_col, LongType()),
            StructField("bin_no", LongType()),
        ]
    )
    cap = int(capacity)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        bins = []
        bin_no, fill = 0, 0
        for tok in pdf[tokens_col].astype(int):
            if fill > 0 and fill + tok > cap:
                bin_no += 1
                fill = 0
            bins.append(bin_no)
            fill += tok
        return pd.DataFrame(
            {
                id_col: pdf[id_col].astype("int64"),
                shard_col: pdf[shard_col].astype("int64"),
                "bin_no": pd.Series(bins, dtype="int64").values,
            }
        )

    keyed = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(shard_col).cast("long").alias(shard_col),
        # a NULL token count (e.g. n_tokens derived from a null text) packs
        # as 0 — it must not reach the kernel as NaN, where astype(int)
        # would fail the whole stage with an opaque PythonException
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias(tokens_col),
    )
    return keyed.groupBy(shard_col).applyInPandas(pack, out_schema)

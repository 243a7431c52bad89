"""Training-data sampling + sequence packing.

Two pipeline stages every large-scale pretraining build runs after
cleaning/dedup, shaped for determinism (re-runs and the correctness
oracle see identical output — no RNG, no partition dependence):

- stratified_sample: exactly n rows per stratum, chosen by a stable
  hash order (md5 of the id), i.e. a fixed deterministic "random"
  sample. One window per stratum — shuffle on the stratum key only.
- pack_sequences: the concat-and-chunk packing used for LLM training
  data: documents ordered deterministically inside each partition key
  are laid end-to-end on a token axis and cut into fixed-budget
  sequences. Expressed as a running-sum window (cumulative tokens),
  so a document's (seq_id, start offset) is pure column algebra —
  no per-row Python, SQL-oracle-expressible, and at scale one shuffle
  on the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(df: DataFrame, key_col: str, n_per_key: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Exactly min(n, stratum size) rows per key, by md5(id) order —
    deterministic, join-stable, oracle-replicable."""
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n_per_key).drop("_rn"))


def pack_sequences(docs: DataFrame, tokens_col: str, budget: int,
                   part_col: str = "source", id_col: str = "doc_id") -> DataFrame:
    """→ (id, part, n_tokens, seq_id, seq_offset): lay documents
    end-to-end per partition key (ordered by id) and cut every `budget`
    tokens. seq_id = which training sequence the document STARTS in;
    seq_offset = its first token's position inside that sequence.
    Documents longer than `budget` span sequences (the chunker splits
    them downstream — assignment here is the shuffle-bearing step)."""
    w = Window.partitionBy(part_col).orderBy(F.col(id_col))
    start = F.coalesce(
        F.sum(F.col(tokens_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0))
    return docs.select(
        F.col(id_col), F.col(part_col),
        F.col(tokens_col).alias("n_tokens"),
        F.floor(start / budget).cast("long").alias("seq_id"),
        (start % budget).cast("long").alias("seq_offset"))

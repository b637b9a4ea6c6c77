"""Distributed reference-parity matcher: blocking join + per-block greedy 1:1.

The reference's flagship operator chain (SURVEY.md §2.3 J1-J3, §3.1):
first-char blocking, block-key *intersection*, and a greedy 1:1 best-match
assignment that is order-dependent (left records in input order, strict ``>``
argmax, right-exclusivity).  That sequential dependency confines the greedy
loop to one block — blocks are independent — so the Spark mapping is:

* derive the block key as a Catalyst expression (``functions.text.block_key``)
* ``df1.groupby(key).cogroup(df2.groupby(key)).applyInPandas(greedy)`` —
  ONE shuffle per side, Arrow-batched, parallel across blocks, sequential
  (as semantics demand) within a block.  Cogroup keys present on only one
  side produce no pairs, which *is* the reference's intersection rule
  (``data_matcher.py:438-441``).
* consolidation is pure DataFrame algebra: cleanliness scores as JVM column
  arithmetic, winner pick via ``when()``, unmatched re-entry via LEFT ANTI
  joins (``data_matcher.py:447-499``).

Determinism: input order is pinned by an explicit ``_fm_seq`` (attached via
``zipWithIndex`` at ingest); within a block records are sorted by
(sort keys..., _fm_seq), which equals the reference's global stable sort
restricted to the block.  Output is therefore independent of parallelism
(local[8] == local[32]; SURVEY.md §5.2.4).

Scale note: first-char blocking gives at most a few hundred blocks — fine
for the reference's person-record workloads, but a single hot block would
cap parallelism at 100 TB.  The scale path swaps this candidate generator
for MinHash/LSH (``operators/minhash.py``) while keeping the same verify +
consolidate algebra.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzy_matching_spark.config import MatchConfig
from fuzzy_matching_spark.functions.text import block_key, cleanliness_col

__all__ = ["SparkMatcher", "attach_seq"]

SEQ = "_fm_seq"
BK = "_fm_bk"


def attach_seq(df: DataFrame) -> DataFrame:
    """Attach a stable input-order sort key (``_fm_seq``).

    This is the DataFrame analog of the reference's list order / ``id()``
    identity tracking (``data_matcher.py:472-497``).  The key only needs to
    be *unique* and *monotone in input order* — it is used as a sort
    tiebreaker within blocks and as a pair id for the consolidation joins,
    never as a dense 0..n-1 index — so ``monotonically_increasing_id()``
    ((partition_id << 33) + row_in_partition) is exactly right: ascending
    across (partition, row), which equals input order for file sources and
    ``createDataFrame``.  Zero extra jobs, shuffles, or windows; the
    previous per-partition-offset implementation ran two eager collect
    jobs plus a window per input and dominated small-match latency.
    """
    if SEQ in df.columns:
        return df
    return df.withColumn(SEQ, F.monotonically_increasing_id())


class SparkMatcher:
    """Distributed ``match_and_consolidate`` with reference semantics."""

    def __init__(self, config: MatchConfig):
        self.config = config
        self.match_fields = [fc.field for fc in config.fields]
        self.weights = {fc.field: fc.weight for fc in config.fields}

    # ------------------------------------------------------------------
    def _prepare(self, df: DataFrame) -> DataFrame:
        """String-coerce record fields (reference loads everything as str)."""
        out = df
        for f in df.columns:
            if f == SEQ:
                continue
            out = out.withColumn(f, F.coalesce(F.col(f).cast("string"), F.lit("")))
        out = attach_seq(out)
        if self.config.block_field:
            key = block_key(F.col(self.config.block_field))
            if self.config.group_fields:
                key = F.concat_ws(
                    "\x1f", key, *[F.col(g) for g in self.config.group_fields]
                )
                # keep NULL semantics: empty block value disables the row
                key = F.when(block_key(F.col(self.config.block_field)).isNotNull(), key)
        else:
            key = F.lit("ALL")
        return out.withColumn(BK, key)

    def _greedy_fn(self):
        config = self.config
        sort_keys = (
            [config.sort_field]
            if config.sort_field
            else [fc.field for fc in config.fields]
        )
        sort_before = config.sort_before_match
        threshold = config.threshold

        def greedy(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            from fuzzy_matching_spark.functions import scoring

            if left.empty or right.empty:
                return pd.DataFrame({"left_seq": [], "right_seq": [], "sim": []}).astype(
                    {"left_seq": "int64", "right_seq": "int64", "sim": "float64"}
                )
            order_cols = ([*sort_keys, SEQ] if sort_before else [SEQ])
            left = left.sort_values([c for c in order_cols if c in left.columns], kind="stable")
            right = right.sort_values([c for c in order_cols if c in right.columns], kind="stable")
            # Whole-block score matrix, vectorized (batched bit-parallel LCS);
            # then the sequential argmax assignment the reference semantics
            # demand (left order, strict >, right exclusivity).  Same output
            # as per-pair scoring — the matrix is just computed up front.
            M = scoring.config_score_matrix(left, right, config)
            lseq = left[SEQ].to_numpy()
            rseq = right[SEQ].to_numpy()
            taken = np.zeros(len(right), dtype=bool)
            out_l, out_r, out_s = [], [], []
            for i in range(len(left)):
                row = np.where(taken, -1.0, M[i])
                j = int(row.argmax())  # first max == reference's strict >
                best = float(row[j])
                if best > 0.0 and best >= threshold:
                    taken[j] = True
                    out_l.append(int(lseq[i]))
                    out_r.append(int(rseq[j]))
                    out_s.append(best)
            return pd.DataFrame({"left_seq": out_l, "right_seq": out_r, "sim": out_s})

        return greedy

    # ------------------------------------------------------------------
    def match_pairs(self, df1: DataFrame, df2: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
        """Run blocking + greedy; returns ``(pairs, prepared1, prepared2)``.

        ``pairs`` has columns ``left_seq, right_seq, sim``.
        """
        d1 = self._prepare(df1)
        d2 = self._prepare(df2)
        g1 = d1.filter(F.col(BK).isNotNull()).groupby(BK)
        g2 = d2.filter(F.col(BK).isNotNull()).groupby(BK)
        pairs = g1.cogroup(g2).applyInPandas(
            self._greedy_fn(), schema="left_seq long, right_seq long, sim double"
        )
        return pairs, d1, d2

    def match_and_consolidate(self, df1: DataFrame, df2: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Distributed twin of the reference entry point.

        Returns ``(matches, consolidated)``:

        * ``matches``: ``Оригинал`` (struct of df1 cols), ``Вариант`` (struct
          of df2 cols), ``Схожесть`` double — the reference's match triple
          (``data_matcher.py:676-680``).
        * ``consolidated``: one cleaner record per match + all unmatched
          records from both inputs (schemas must agree).
        """
        pairs, d1, d2 = self.match_pairs(df1, df2)
        # The greedy cogroup is the expensive stage and is consumed by three
        # branches (winner pick + two anti-joins); persist its tiny output
        # (id pairs + sim) so the plan runs it once, not three times.
        pairs = pairs.persist()
        cols = [c for c in d1.columns if c not in (SEQ, BK)]

        clean = cleanliness_col(self.match_fields, self.weights)
        field_len = sum(
            F.length(F.coalesce(F.col(f).cast("string"), F.lit("")))
            for f in self.match_fields
        )
        a = d1.withColumn("_clean", clean).withColumn("_flen", field_len).alias("a")
        b = d2.withColumn("_clean", clean).withColumn("_flen", field_len).alias("b")

        joined = (
            pairs.alias("p")
            .join(a, F.col("p.left_seq") == F.col(f"a.{SEQ}"))
            .join(b, F.col("p.right_seq") == F.col(f"b.{SEQ}"))
        )

        s1 = F.struct(*[F.col(f"a.{c}").alias(c) for c in cols])
        s2 = F.struct(*[F.col(f"b.{c}").alias(c) for c in cols])
        matches = joined.select(
            s1.alias("Оригинал"), s2.alias("Вариант"), F.col("p.sim").alias("Схожесть")
        )

        # cleaner-record pick: lower score wins; tie -> shorter field length;
        # tie -> left (reference select_cleaner_record, data_matcher.py:262-281)
        winner = (
            F.when(F.col("a._clean") < F.col("b._clean"), s1)
            .when(F.col("b._clean") < F.col("a._clean"), s2)
            .otherwise(F.when(F.col("a._flen") <= F.col("b._flen"), s1).otherwise(s2))
        )
        winners = joined.select(winner.alias("w")).select("w.*")

        un1 = (
            d1.join(pairs.select("left_seq"), d1[SEQ] == F.col("left_seq"), "left_anti")
            .select(*cols)
        )
        un2 = (
            d2.join(pairs.select("right_seq"), d2[SEQ] == F.col("right_seq"), "left_anti")
            .select(*cols)
        )
        consolidated = winners.unionByName(un1).unionByName(un2)
        return matches, consolidated

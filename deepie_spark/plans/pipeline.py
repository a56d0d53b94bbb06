"""End-to-end KG-construction pipeline with checkpoint/resume.

Stage DAG (each stage a lakehouse table, resumable):

    pages -> texts -> tokens -> triples -> linked -> entity_clusters
                         \\-> mentions                      |
                                       kg_triples <- MERGE -+
                                       kg_entities <- MERGE

Lifecycle mirrors the reference flagship run (SURVEY.md §3.1) with the
pickle cache replaced by fingerprinted stage tables.  ``run()`` is
idempotent: a killed job re-run with the same run_id skips committed
stages (lineage check) and re-derives the rest — the north rule's
"resumes idempotently mid-crawl".
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepie_spark.operators import extract as ex_ops
from deepie_spark.operators.canonicalize import canonicalize_entities
from deepie_spark.operators.linking import (
    alias_dim_with_key,
    detect_mentions,
    link_triples,
)
from deepie_spark.operators.metrics import obj_key
from deepie_spark.sources.lakehouse import Lakehouse


@dataclass
class PipelineResult:
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    wall_s: dict[str, float] = field(default_factory=dict)


class KgPipeline:
    def __init__(
        self,
        spark: SparkSession,
        lake_root: str,
        extractor,
        run_id: str = "run0",
        url_buckets: int = 32,
        durable_cc: bool = False,
    ):
        self.spark = spark
        self.lake = Lakehouse(lake_root, spark)
        self.extractor_bc = spark.sparkContext.broadcast(extractor)
        self.run_id = run_id
        self.url_buckets = url_buckets
        # durable_cc: connected-components rounds snapshot to the lake
        # (driver-loss resume mid-CC, not just mid-stage); off by
        # default — stage-level resume already covers the common case
        # and the snapshots cost one parquet round-trip per CC round
        self.cc_state_dir = (
            f"{lake_root}/_cc_state/{run_id}" if durable_cc else None
        )

    # -- stage definitions -------------------------------------------------

    def _stage(self, name: str, fn, result: PipelineResult, resume: bool) -> DataFrame:
        if resume and self.lake.stage_done(name, self.run_id):
            result.stages_skipped.append(name)
            return self.lake.read(name)
        t0 = time.time()
        df = fn()
        self.lake.write_stage(df, name, run_id=self.run_id)
        result.stages_run.append(name)
        result.wall_s[name] = time.time() - t0
        return self.lake.read(name)

    def run(
        self,
        pages_df: DataFrame,
        alias_df: DataFrame,
        resume: bool = True,
        staged_extraction: bool = True,
    ) -> PipelineResult:
        res = PipelineResult()
        bc = self.extractor_bc
        # bucket column: deterministic url bucket, the partition handle
        # for per-partition lineage and (on Iceberg) bucket(url) spec
        bucket = F.pmod(F.xxhash64("url"), F.lit(self.url_buckets)).cast("int")

        texts = self._stage(
            "texts",
            lambda: ex_ops.stage_texts(pages_df).withColumn("url_bucket", bucket),
            res, resume,
        )
        tokens = self._stage(
            "tokens", lambda: ex_ops.stage_tokens(texts, bc), res, resume
        )
        self._stage(
            "mentions", lambda: detect_mentions(tokens, bc), res, resume
        )
        if staged_extraction:
            def _triples():
                subjects = ex_ops.stage_subjects(tokens, bc)
                po = ex_ops.stage_po(subjects, bc)
                return ex_ops.stage_triples(po, bc)
        else:
            def _triples():
                return ex_ops.extract_triples_fused(texts, bc)
        triples = self._stage("triples", _triples, res, resume)

        alias_dim = alias_dim_with_key(alias_df, bc)
        linked = self._stage(
            "linked", lambda: link_triples(triples, alias_dim, bc), res, resume
        )
        clusters = self._stage(
            "entity_clusters",
            lambda: canonicalize_entities(
                linked, alias_dim, bc, cc_state_dir=self.cc_state_dir
            ),
            res, resume,
        )

        # -- graph materialization (MERGE) --------------------------------
        def _kg_triples():
            t = linked.withColumn("object_key", obj_key(F.col("object")))
            return t.withColumn(
                "triple_key",
                F.xxhash64("url", "subject", "predicate", "object_key"),
            )

        kg_t = _kg_triples()
        self.lake.merge_upsert(kg_t, "kg_triples", ["triple_key"], run_id=self.run_id)
        res.stages_run.append("kg_triples")

        kg_e = (
            clusters.groupBy("component")
            .agg(
                F.min("cluster_canonical_id").alias("canonical_id"),
                F.min("norm_key").alias("representative"),
                F.count(F.lit(1)).alias("n_surfaces"),
            )
        )
        self.lake.merge_upsert(kg_e, "kg_entities", ["component"], run_id=self.run_id)
        res.stages_run.append("kg_entities")
        return res

"""The flagship KG-construction DAG (SURVEY.md §3 E3, §4.4).

documents_interleaved ──(JVM array ops)── full_text
  → BPE tokenize (Arrow pandas UDF, X1)
  → mention detection (broadcast dict join, JVM) → linking/canonicalize (J4)
  → length-bucketed encode+score (mapInPandas, P1+P2) — per-bucket commits
  → LSE pooling (A2, relational) → threshold (F7)
  → triples (D8) partitioned by pred (S7) → salted dedup/edges (A5/P3)
  → eval vs gold (J6/J7/A4)

Every stage commits through ManifestParquetTableIO (lineage + counters);
``resume=True`` skips committed stages/buckets — the kill-and-rerun
idempotency gate in tests/test_resume.py drives exactly this path.

Shuffle budget (SURVEY.md §4.4): detection join is broadcast (no shuffle);
the scoring stage repartitions by range on n_toks (shuffle 1 — doubles as
W1 length bucketing); LSE pools on (doc, chem, dis) (shuffle 2); triple
dedup on (subj, pred, obj) (shuffle 3). Nothing else exchanges.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bran_spark.functions.bpe import full_text_col, load_codec, with_tokens
from bran_spark.model.encoder import Weights
from bran_spark.model.scorer import score_documents
from bran_spark.operators.evaluate import confusion
from bran_spark.operators.linking import canonical_triples, link_mentions
from bran_spark.operators.mentions import detect_mentions
from bran_spark.operators.pooling import dedup_triples, lse_pool, threshold, to_triples
from bran_spark.sources.tableio import ManifestParquetTableIO


@dataclass
class PipelineConfig:
    fixture_dir: str
    checkpoint_root: str
    theta: float = 0.0
    score_buckets: int = 8          # resume granularity of the expensive stage
    salt_buckets: int = 16          # P3 skew fan-out
    max_tokens: int = 512           # F4 cap
    checkpoint: bool = True
    extra: dict = field(default_factory=dict)


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: PipelineConfig,
        docs_df: DataFrame | None = None,
        mesh_df: DataFrame | None = None,
    ):
        """``docs_df``/``mesh_df`` inject alternative inputs (e.g. the
        plain-corpus adapter, sources.interleave); default reads the
        fixture tables from cfg.fixture_dir."""
        self.spark = spark
        self.cfg = cfg
        self.io = ManifestParquetTableIO(cfg.checkpoint_root)
        self._docs_df = docs_df
        self._mesh_df = mesh_df
        self._codec_bc = None
        self._weights_bc = None

    # ---- inputs ----------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.cfg.fixture_dir, f"{name}.parquet")

    def documents(self) -> DataFrame:
        if self._docs_df is not None:
            return self._docs_df
        return self.spark.read.parquet(self._path("documents_interleaved"))

    def mesh_dict(self) -> DataFrame:
        if self._mesh_df is not None:
            return self._mesh_df
        return self.spark.read.parquet(self._path("mesh_dict"))

    def codec_bc(self):
        if self._codec_bc is None:
            codec = load_codec(
                self.spark, self._path("bpe_merges"), self._path("vocab")
            )
            self._codec_bc = self.spark.sparkContext.broadcast(codec)
        return self._codec_bc

    def weights_bc(self):
        if self._weights_bc is None:
            w = Weights.load(os.path.join(self.cfg.fixture_dir, "model_weights.npz"))
            self._weights_bc = self.spark.sparkContext.broadcast(w)
        return self._weights_bc

    # ---- stages ----------------------------------------------------------
    def tokenized(self) -> DataFrame:
        """documents + full_text + words + BPE tokens (+F4 length cap)."""
        docs = self.documents().withColumn("full_text", full_text_col("spans"))
        toks = with_tokens(docs, self.codec_bc())
        return toks.withColumn(
            "tokens", F.slice("tokens", 1, self.cfg.max_tokens)
        ).withColumn("n_toks", F.size("tokens"))

    def stage_mentions(self, resume: bool = True) -> DataFrame:
        if self.cfg.checkpoint and resume and self.io.exists("mentions_linked"):
            return self.io.read(self.spark, "mentions_linked")
        mentions = detect_mentions(self.tokenized(), self.mesh_dict())
        linked, unlinked = link_mentions(mentions, self.mesh_dict())
        if self.cfg.checkpoint:
            self.io.write(unlinked, "mentions_unlinked", stage="link")
            self.io.write(
                linked, "mentions_linked", stage="detect+link",
                inputs={"documents": None},
            )
            return self.io.read(self.spark, "mentions_linked")
        return linked

    def _score_input(self, mentions: DataFrame) -> DataFrame:
        docs = self.tokenized().select(
            "doc_id",
            F.expr("transform(tokens, t -> t.tok_id)").alias("tok_ids"),
            F.expr("transform(tokens, t -> t.start)").alias("tok_starts"),
            "n_toks",
        )
        magg = mentions.groupBy("doc_id").agg(
            F.collect_list(
                F.struct("mention_id", "type", "mesh_id", "start", "end")
            ).alias("mentions")
        )
        return docs.join(magg, "doc_id", "inner")

    def stage_scores(self, mentions: DataFrame, resume: bool = True) -> DataFrame:
        """Encode + bi-affine score, committed per doc_id hash bucket."""
        B = self.cfg.score_buckets
        if not self.cfg.checkpoint:
            inp = self._score_input(mentions)
            bucketed = inp.repartitionByRange(
                int(self.spark.conf.get("spark.sql.shuffle.partitions")), "n_toks"
            )
            return score_documents(bucketed, self.weights_bc())
        done = self.io.committed_buckets("pair_scores")
        todo = [b for b in range(B) if b not in done]
        if todo:
            inp = self._score_input(mentions).withColumn(
                "_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(B))
            )
            for b in todo:
                part = (
                    inp.where(F.col("_bucket") == b)
                    .drop("_bucket")
                    .repartitionByRange(  # W1 length bucketing inside the bucket
                        max(4, int(self.spark.conf.get("spark.sql.shuffle.partitions")) // B * 2),
                        "n_toks",
                    )
                )
                self.io.commit_bucket(
                    score_documents(part, self.weights_bc()),
                    "pair_scores", b, stage="encode+score",
                    config={"theta": self.cfg.theta, "max_tokens": self.cfg.max_tokens},
                )
        return self.io.read_buckets(self.spark, "pair_scores")

    def stage_triples(self, scores: DataFrame, resume: bool = True) -> DataFrame:
        if self.cfg.checkpoint and resume and self.io.exists("triples"):
            return self.io.read(self.spark, "triples")
        pooled = lse_pool(scores, ["doc_id", "chem_mesh", "dis_mesh"], "score")
        kept = threshold(pooled, self.cfg.theta)
        triples = canonical_triples(to_triples(kept), self.mesh_dict())
        if self.cfg.checkpoint:
            self.io.write(
                triples, "triples", stage="pool+threshold+canonicalize",
                inputs={"pair_scores": None},
                partition_by=["pred"],           # S7 layout mandate
                config={"theta": self.cfg.theta},
            )
            return self.io.read(self.spark, "triples")
        return triples

    def stage_edges(self, triples: DataFrame, resume: bool = True) -> DataFrame:
        if self.cfg.checkpoint and resume and self.io.exists("edges"):
            return self.io.read(self.spark, "edges")
        edges = dedup_triples(triples, self.cfg.salt_buckets)
        if self.cfg.checkpoint:
            self.io.write(
                edges, "edges", stage="dedup+support", inputs={"triples": None},
                partition_by=["pred"],
            )
            return self.io.read(self.spark, "edges")
        return edges

    # ---- end to end ------------------------------------------------------
    def run(self, resume: bool = True, evaluate: bool = True) -> dict:
        """With checkpointing, each stage materializes exactly once (counts
        read the committed parquet). Without it, intermediates are persisted
        in memory — otherwise every downstream count would re-execute the
        expensive scoring lineage."""
        t0 = time.time()
        mentions = self.stage_mentions(resume)
        scores = self.stage_scores(mentions, resume)
        if not self.cfg.checkpoint:
            mentions = mentions.persist()
            scores = scores.persist()
        triples = self.stage_triples(scores, resume)
        edges = self.stage_edges(triples, resume)
        if not self.cfg.checkpoint:
            triples = triples.persist()
        n_triples = triples.count()
        out = {
            "docs": self.documents().count(),
            "mentions": mentions.count(),
            "pair_scores": scores.count(),
            "triples": n_triples,
            "edges": edges.count(),
            "wall_s": round(time.time() - t0, 3),
        }
        if evaluate:
            gold = self.spark.read.parquet(self._path("gold_relations")).select(
                "doc_id", "chem_mesh", "dis_mesh"
            )
            pred = triples.select(
                F.col("subj").alias("chem_mesh"),
                F.col("obj").alias("dis_mesh"),
                "doc_id",
            )
            m = confusion(pred, gold).head()
            out.update(
                {"precision": m.precision, "recall": m.recall, "f1": m.f1}
            )
        return out


def flagship(spark: SparkSession, fixture_dir: str, checkpoint_root: str | None = None,
             checkpoint: bool = False, theta: float = 0.0,
             docs_df: DataFrame | None = None, mesh_df: DataFrame | None = None) -> DataFrame:
    """The __spark_entry__.entry() DataFrame: end-to-end triples, lazily
    composed (no checkpointing) so the driver can inspect the single plan."""
    cfg = PipelineConfig(
        fixture_dir=fixture_dir,
        checkpoint_root=checkpoint_root or os.path.join(os.getcwd(), "checkpoints", "entry"),
        checkpoint=checkpoint,
        theta=theta,
    )
    p = Pipeline(spark, cfg, docs_df=docs_df, mesh_df=mesh_df)
    mentions = p.stage_mentions(resume=False)
    scores = p.stage_scores(mentions, resume=False)
    return p.stage_triples(scores, resume=False)


def flagship_plain(spark: SparkSession, sf_dir: str, theta: float = 0.0) -> DataFrame:
    """Flagship DAG over a *plain* corpus (the driver's documents.parquet):
    plain text → interleaved shape (sources.interleave) → full KG pipeline.
    BPE/weights come from the seeded sf0.001 fixtures (scale-independent)."""
    from bran_spark.fixtures.gen import ensure, fixture_dir as fdir
    from bran_spark.sources.interleave import interleave_documents, plain_mesh_dict

    ensure(0.001)
    plain = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return flagship(
        spark,
        fdir(0.001),
        theta=theta,
        docs_df=interleave_documents(plain),
        mesh_df=plain_mesh_dict(spark),
    )

"""KG quality, shape validation and serving-side reshaping — the gate a
KG-construction pipeline runs between the fused triple table and the
published graph, plus the instance-level alignment that reconciles a new
ingest against the existing store.

The reference emits one fixed-schema triple set and needs none of this;
the north_rule's warehouse-scale KG (10^12 documents, many feeds) does:
ontology constraint checking (SHACL-lite domain/range/cardinality),
property-table materialization (the classic RDF-store trick of pivoting
functional predicates into a wide entity table so star queries stop
self-joining), star-pattern matching over the predicate-partitioned
triple sink, and entity alignment between two statement stores.

Scale shapes (all predicates/constraints are vocabulary-sized — tiny):
- validate_kg: constraint dim broadcast onto one triple scan (domain +
  range in a single partial-aggregating pass) plus one (pred, subj)
  aggregate for cardinality — two shuffles total, both on reduced keys.
- property_table: one pivot aggregate on subj with an explicit predicate
  list (no extra distinct-values pass), filter pushed below the pivot.
- star_pattern: each arm is a pred-filtered scan (partition-pruned when
  the sink is partitioned by pred, plans/pipeline.py S7) semi-joined on
  subj — never a cartesian, never a full-graph shuffle per arm beyond
  the subj-key exchanges.
- align_entities: candidate generation joins ONLY on (pred, obj) keys
  whose fanout survives a hot-key df-cut on both sides (the PARIS-style
  functionality restriction: near-unique statements carry the signal,
  'brand = X' shared by 10^5 entities carries none and would go
  quadratic), then one pair aggregate + per-left-entity top-1 window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "validate_kg",
    "property_table",
    "star_pattern",
    "align_entities",
    "schema_graph",
]


def _etype(col: str):
    """Entity type of a type-prefixed id ('C:17' -> 'C')."""
    return F.split(F.col(col), ":").getItem(0)


def validate_kg(triples: DataFrame, constraints: DataFrame) -> DataFrame:
    """SHACL-lite constraint validation over a type-prefixed triple table.

    ``constraints``: one row per governed predicate with columns
    (pred, domain, range, functional) — domain/range are entity-type
    prefixes, functional means every subject has at most one object.
    Ungoverned predicates are not checked (inner join), mirroring how an
    ontology only speaks about predicates it declares.

    Returns long-form (pred, kind, n_checked, n_violations) with kind in
    {'domain', 'range', 'functional'}: domain/range count violating
    TRIPLES; functional counts violating SUBJECTS (those asserting >1
    distinct object). A NULL subj/obj or a missing ':' prefix counts as a
    violation of domain/range — malformed ids must not pass silently.

    Scale: the constraint table is predicate-vocabulary-sized → broadcast;
    domain+range are ONE map-side-combining aggregate over a single triple
    scan; the cardinality check is one (pred, subj) aggregate restricted
    to functional predicates (filter pushed below the shuffle), then a
    per-pred rollup. Nothing entity-vocabulary-sized is ever broadcast.
    """
    dim = F.broadcast(
        constraints.select("pred", "domain", "range", "functional")
    )
    j = triples.join(dim, "pred")
    dom_rng = (
        j.groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(
                F.when(_etype("subj").eqNullSafe(F.col("domain")), 0).otherwise(1)
            ).alias("dom_viol"),
            F.sum(
                F.when(_etype("obj").eqNullSafe(F.col("range")), 0).otherwise(1)
            ).alias("rng_viol"),
        )
    )
    domain = dom_rng.select(
        "pred",
        F.lit("domain").alias("kind"),
        F.col("n_checked").cast("long"),
        F.col("dom_viol").cast("long").alias("n_violations"),
    )
    rng = dom_rng.select(
        "pred",
        F.lit("range").alias("kind"),
        F.col("n_checked").cast("long"),
        F.col("rng_viol").cast("long").alias("n_violations"),
    )
    functional = (
        j.where(F.col("functional"))
        .groupBy("pred", "subj")
        .agg(F.countDistinct("obj").alias("n_obj"))
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.when(F.col("n_obj") > 1, 1).otherwise(0)).alias(
                "n_violations"
            ),
        )
        .select(
            "pred",
            F.lit("functional").alias("kind"),
            F.col("n_checked").cast("long"),
            F.col("n_violations").cast("long"),
        )
    )
    return domain.unionByName(rng).unionByName(functional)


def property_table(triples: DataFrame, preds: list[str]) -> DataFrame:
    """Pivot the given predicates into a wide (subj, <pred>...) entity
    table — the RDF property-table materialization (Abadi et al., SW-Store
    VLDB'09 lineage): star queries over functional predicates become
    column lookups instead of per-arm self-joins.

    Multi-valued predicates collapse deterministically to MAX(obj); only
    subjects asserting at least one listed predicate appear (the pred
    filter prunes the scan BEFORE the pivot shuffle). The explicit
    ``preds`` list skips Spark's extra distinct-values job and pins the
    output schema — at 10^12 triples a blind pivot would scan the corpus
    twice.
    """
    return (
        triples.where(F.col("pred").isin(preds))
        .groupBy("subj")
        .pivot("pred", preds)
        .agg(F.max("obj"))
    )


def star_pattern(
    triples: DataFrame,
    arms: dict[str, str | None],
    select_pred: str,
    binding_name: str = "binding",
) -> DataFrame:
    """Star-pattern match over the triple table: return (subj, binding)
    pairs of ``select_pred`` for subjects satisfying every arm — arm value
    None means existence (subj asserts the predicate), a string means
    equality on the object. The SPARQL shape
    ``?s contains ?x . ?s from_nation N:5 . ?s uses_supplier ?any``.

    Each arm is a pred-equality filter (partition-pruned on a pred-
    partitioned sink) reduced to a DISTINCT subj set and applied as a
    LEFT SEMI join — arms never multiply rows, so a hub subject with 10^4
    fan-out cannot explode intermediate cardinality the way an inner-join
    chain would.
    """
    out = (
        triples.where(F.col("pred") == select_pred)
        .select("subj", F.col("obj").alias(binding_name))
        .distinct()
    )
    for pred, obj in arms.items():
        arm = triples.where(F.col("pred") == pred)
        if obj is not None:
            arm = arm.where(F.col("obj") == obj)
        out = out.join(arm.select("subj").distinct(), "subj", "left_semi")
    return out


def align_entities(
    a: DataFrame,
    b: DataFrame,
    max_key_fanout: int = 4,
    min_shared: int = 1,
) -> DataFrame:
    """Instance-level entity alignment between two statement stores
    (PARIS-style, Suchanek et al. VLDB'12, functionality heuristic made
    into a hard df-cut): candidate sames share a discriminative
    (pred, obj) statement; score is the Jaccard of the two entities' FULL
    statement sets; emit the best right-side match per left entity.

    Inputs are (subj, pred, obj) frames. A (pred, obj) key asserted by
    more than ``max_key_fanout`` subjects on EITHER side is cut before
    the candidate join — 'brand = Brand#13' shared by 10^5 products
    carries no alignment signal but would make the equi-join quadratic;
    near-unique keys (labels, identifiers) carry all of it. The cut keeps
    candidate generation O(Σ fanout_a·fanout_b) with both factors ≤ the
    cap. Statement-set sizes for the Jaccard are computed on the UNCUT
    sets, so hot keys still count toward set size — only candidate
    generation ignores them.

    Output: (subj_a, subj_b, shared, jaccard), jaccard rounded 6 dp,
    exact ties broken by subj_b ascending — deterministic.
    """
    sa = a.select("subj", "pred", "obj").distinct()
    sb = b.select("subj", "pred", "obj").distinct()

    def kept(s: DataFrame) -> DataFrame:
        fan = s.groupBy("pred", "obj").agg(
            F.count(F.lit(1)).alias("fanout")
        )
        return (
            s.join(fan.where(F.col("fanout") <= max_key_fanout), ["pred", "obj"])
            .select("subj", "pred", "obj")
        )

    ka = kept(sa)
    kb = kept(sb)
    shared = (
        ka.join(kb.withColumnRenamed("subj", "subj_b"), ["pred", "obj"])
        .withColumnRenamed("subj", "subj_a")
        .groupBy("subj_a", "subj_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    na = sa.groupBy("subj").agg(F.count(F.lit(1)).alias("n_a"))
    nb = sb.groupBy("subj").agg(F.count(F.lit(1)).alias("n_b"))
    scored = (
        shared.join(na.withColumnRenamed("subj", "subj_a"), "subj_a")
        .join(nb.withColumnRenamed("subj", "subj_b"), "subj_b")
        .select(
            "subj_a",
            "subj_b",
            F.col("shared").cast("long"),
            F.round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("subj_a").orderBy(
        F.col("jaccard").desc(), F.col("subj_b").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def schema_graph(triples: DataFrame) -> DataFrame:
    """ABox→TBox summarization: collapse the instance-level triple store
    to its schema graph — one row per (subj_type, pred, obj_type) edge
    class with triple count and distinct subject/object cardinalities.
    The first thing a KG browser or a join planner asks of a 10^12-triple
    store ("what links orders to suppliers, and how many-to-how-many?"),
    and the sanity gate that catches a mis-prefixed feed as a brand-new
    edge class instead of silent pollution.

    One aggregate over a single scan (types are prefix-parses, no join);
    countDistinct on subj/obj partial-aggregates per group. Output is
    schema-scale (|types|² · |preds| rows) — tiny by construction.
    """
    return (
        triples.groupBy(
            _etype("subj").alias("subj_type"),
            F.col("pred"),
            _etype("obj").alias("obj_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_triples"),
            F.countDistinct("subj").cast("long").alias("n_subj"),
            F.countDistinct("obj").cast("long").alias("n_obj"),
        )
    )

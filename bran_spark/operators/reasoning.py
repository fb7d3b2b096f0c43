"""Ontology reasoning over the lifted KG — RDFS entailment
materialization and SPARQL 1.1 property-path evaluation.

A KG-construction pipeline does not stop at extracted (subj, pred,
obj) rows: downstream consumers query the graph THROUGH its ontology
(every Customer is an Agent; in_nation is a kind of located_in), so
the engine must either materialize the entailed triples once or
rewrite every query. These operators take the materialization route —
the Spark-friendly one, since entailment is a handful of broadcast
joins against an ontology-sized schema plus one distinct.

Scale notes (100 TB):
- The SCHEMA (subClassOf / subPropertyOf / domain / range statements)
  is ontology-sized — thousands of rows at worst, never corpus-sized.
  Its transitive closures are computed by a driver-side fixpoint loop
  of joins on that tiny DataFrame and then BROADCAST against the
  corpus-sized triple table; the corpus is touched by map-side joins
  only, plus the final distinct (one shuffle on the output key).
- Property paths evaluate left-to-right as repartition joins on the
  edge relations with a DISTINCT after every composition step — the
  standard semi-naive guard that keeps bounded-star expansion from
  re-deriving the same pair once per walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: RDFS vocabulary (short local names; IRI prefixes add nothing here)
SUB_CLASS = "subClassOf"
SUB_PROP = "subPropertyOf"
DOMAIN = "domain"
RANGE = "range"


def _transitive_closure_small(
    edges: DataFrame, max_iters: int = 16
) -> DataFrame:
    """Non-reflexive transitive closure of an ONTOLOGY-SIZED edge set
    (s, o) by iterated squaring: each round joins the closure-so-far
    with itself, so depth d needs ceil(log2(d)) rounds, not d. The
    per-round count() is legal — the input is schema, not corpus.
    Raises only on pathological DEPTH (no convergence in ``max_iters``
    squaring rounds). A cyclic hierarchy CONVERGES — the closure then
    contains s==o rows and the cycle's classes effectively merge; cycle
    detection, if wanted, is the caller's check on those rows."""
    clo = edges.select("s", "o").distinct().persist()
    n = clo.count()
    for _ in range(max_iters):
        stepped = (
            clo.alias("a")
            .join(clo.alias("b"), F.col("a.o") == F.col("b.s"))
            .select(F.col("a.s").alias("s"), F.col("b.o").alias("o"))
        )
        nxt = clo.unionByName(stepped).distinct().persist()
        m = nxt.count()
        clo.unpersist()
        clo = nxt
        if m == n:
            return clo
        n = m
    raise RuntimeError(
        f"transitive closure did not converge in {max_iters} squaring "
        "rounds — cyclic or pathologically deep hierarchy"
    )


def prepare_ontology(schema: DataFrame, max_iters: int = 16) -> dict:
    """Pre-close the ontology once: {'sub_prop', 'sub_cls', 'dom',
    'rng'} DataFrames, all ontology-sized, ready to broadcast against
    any number of corpus batches (the streaming incremental closure
    computes this once, outside foreachBatch)."""
    return {
        "sub_prop": _transitive_closure_small(
            schema.where(F.col("p") == SUB_PROP).select("s", "o"),
            max_iters,
        ),
        "sub_cls": _transitive_closure_small(
            schema.where(F.col("p") == SUB_CLASS).select("s", "o"),
            max_iters,
        ),
        "dom": schema.where(F.col("p") == DOMAIN).select(
            F.col("s").alias("pred"), F.col("o").alias("cls0")
        ),
        "rng": schema.where(F.col("p") == RANGE).select(
            F.col("s").alias("pred"), F.col("o").alias("cls0")
        ),
    }


def rdfs_derivations(
    triples: DataFrame, onto: dict, persist: bool = True
) -> DataFrame:
    """Per-triple RDFS derivation rows (entity, cls, cls0, pred, role)
    for a triple batch against a :func:`prepare_ontology` result —
    the pre-aggregation stage of :func:`rdfs_closure`. RDFS rules are
    per-triple, so this distributes over unions of batches: the closure
    of a growing corpus is the DISTINCT-aggregated union of each
    batch's derivations, which is what makes the incremental streaming
    materialization exact.

    ``persist=True`` (batch default) caches the two multiply-consumed
    frames for the life of the session (the AMIE precedent — a handful
    of InMemoryRelations per job). Pass ``persist=False`` from
    PER-BATCH contexts (foreachBatch): there each call would otherwise
    pin two more cache entries forever, growing storage with every
    micro-batch, and re-scanning one micro-batch is cheaper than that."""
    sub_prop, sub_cls = onto["sub_prop"], onto["sub_cls"]
    dom, rng = onto["dom"], onto["rng"]

    def _pin(df: DataFrame) -> DataFrame:
        return df.persist() if persist else df

    # The input is consumed TWICE here (raw + subproperty-lifted) and the
    # lifted frame twice more below (domain + range attach), so a lazy
    # ``triples`` subtree would re-execute up to 4×; persisting it once
    # keeps the corpus scan single-pass (same fix as AMIE's lifted KG —
    # q292 at sf0.1 dropped ~7× with this + the lifted persist).
    t = _pin(triples.select("subj", "pred", "obj"))
    # rdfs7: lift each corpus triple through the subPropertyOf closure
    # (keeping the original pred too). Corpus-side map-only: the
    # closure is broadcast.
    lifted = _pin(
        t.unionByName(
            t.join(
                F.broadcast(sub_prop.withColumnRenamed("s", "pred")),
                "pred",
            ).select("subj", F.col("o").alias("pred"), "obj")
        )
    )

    # rdfs2 + rdfs3: base type assertions with (pred, role) provenance.
    base = (
        lifted.join(F.broadcast(dom), "pred")
        .select(
            F.col("subj").alias("entity"),
            F.col("cls0"),
            F.col("pred"),
            F.lit("S").alias("role"),
        )
        .unionByName(
            lifted.join(F.broadcast(rng), "pred").select(
                F.col("obj").alias("entity"),
                F.col("cls0"),
                F.col("pred"),
                F.lit("O").alias("role"),
            )
        )
    )

    # rdfs9: every base class also asserts its superclasses. The class
    # map is REFLEXIVE-closed on the ontology side (every domain/range
    # class maps to itself, plus its subClassOf closure), so one INNER
    # broadcast join covers both the base class and its superclasses —
    # a single pass over the corpus-sized ``base`` instead of the
    # left-join-plus-union formulation's two.
    refl = (
        dom.select("cls0")
        .unionByName(rng.select("cls0"))
        .distinct()
        .withColumn("cls", F.col("cls0"))
    )
    cls_map = refl.unionByName(
        sub_cls.withColumnRenamed("s", "cls0").withColumnRenamed(
            "o", "cls"
        )
    )
    return base.join(F.broadcast(cls_map), "cls0").select(
        "entity", "cls", "cls0", "pred", "role"
    )


def aggregate_closure(derivations: DataFrame) -> DataFrame:
    """(entity, cls, n_derivations) from derivation rows; duplicates —
    within a batch or across accumulated batches — collapse under the
    DISTINCT, so re-aggregating a merged derivation store is exact."""
    return derivations.groupBy("entity", "cls").agg(
        F.count_distinct("pred", "role", "cls0")
        .cast("long")
        .alias("n_derivations")
    )


def rdfs_closure(
    triples: DataFrame,
    schema: DataFrame,
    max_iters: int = 16,
) -> DataFrame:
    """RDFS entailment: materialize every (entity, class) type
    assertion the schema licenses for a triple corpus via domain/range
    typing. Scope note: explicit ``rdf:type`` triples already asserted
    IN the corpus are out of scope here — rdfs9 lifts only the
    domain/range-DERIVED types; a corpus that asserts type edges
    directly should union them in via a type-predicate adapter before
    calling this.

    Rules applied (RDFS standard rule names):
    - rdfs7: p subPropertyOf q, (s p o) ⇒ (s q o) — via the CLOSURE of
      subPropertyOf, so chains lift in one join.
    - rdfs2: domain(p) = C, (s p o) ⇒ s type C.
    - rdfs3: range(p) = C, (s p o) ⇒ o type C.
    - rdfs9: C subClassOf D, e type C ⇒ e type D — via the CLOSURE of
      subClassOf.

    ``schema`` has columns (s, p, o) with p ∈ {subClassOf,
    subPropertyOf, domain, range}; it is ontology-sized and broadcast.
    ``triples`` has (subj, pred, obj) and is corpus-sized.

    Output: one row per entailed (entity, cls) with ``n_derivations``
    = the number of DISTINCT base derivations (pred, role ∈ {S, O},
    base class) that support it — the provenance count a debugging
    ontologist asks for first ("why is this order a Place?").

    Plan shape (r06 fused path — guide §2.3/§2.4): the WHOLE rule set
    is pre-composed on the ontology side into one derivation-combo
    table D(pred₀ → lifted pred, role, cls0, cls, bit), where ``bit``
    is a dense id over the distinct (lifted pred, role, cls0) combos —
    ontology-sized by construction, enumerated driver-side. The corpus
    then sees ONE broadcast join against D plus ONE shuffle: groupBy
    (entity, cls) OR-ing 64-bit combo masks (partial-aggregated
    map-side), with n_derivations = popcount of the OR — bit-equal to
    the previous count_distinct(pred, role, cls0) formulation, which
    shuffled the ~|combos|× expanded derivation rows TWICE (partial
    dedup + final count) with three string key columns riding along.
    Combos beyond 64 spill into extra mask columns (chunked), so the
    path stays exact for any ontology size; :func:`rdfs_derivations` /
    :func:`aggregate_closure` keep the row-level derivation store shape
    for the incremental streaming materialization.

    The ontology side runs in PLAIN PYTHON on the driver (one collect of
    the ontology-sized ``schema``): the previous driver-looped DataFrame
    fixpoint cost ~12 s of tiny-data Spark jobs per call at sf0.1 —
    two iterated-squaring closures with a persist+count per round plus
    an ontology join pipeline — versus milliseconds as dict/set
    fixpoints. ``max_iters`` still bounds the Python fixpoint so a
    pathologically deep hierarchy fails the same way."""
    combo = _derivation_combos_py(
        triples.sparkSession, schema.select("s", "p", "o").collect(), max_iters
    )
    if combo is None:
        # degenerate ontology (no domain/range statements): no
        # derivations exist; preserve the empty-result schema
        onto = prepare_ontology(schema, max_iters)
        return aggregate_closure(rdfs_derivations(triples, onto, persist=False))
    n_combos, d = combo
    t = triples.select("subj", "pred", "obj")
    hits = t.join(F.broadcast(d), t["pred"] == d["pred0"]).select(
        F.when(F.col("role") == "S", F.col("subj"))
        .otherwise(F.col("obj"))
        .alias("entity"),
        "cls",
        "bit",
    )
    n_chunks = (n_combos + 63) // 64
    masks = [
        F.when(
            (F.col("bit") >= k * 64) & (F.col("bit") < (k + 1) * 64),
            # python-side shiftleft only takes a literal shift; the SQL
            # form accepts a column expression
            F.expr(f"shiftleft(1L, cast(bit - {k * 64} as int))"),
        ).otherwise(F.lit(0).cast("long"))
        for k in range(n_chunks)
    ]
    aggs = [
        F.bit_or(m).alias(f"_m{k}") for k, m in enumerate(masks)
    ]
    popcnt = None
    for k in range(n_chunks):
        c = F.bit_count(F.col(f"_m{k}")).cast("long")
        popcnt = c if popcnt is None else popcnt + c
    return (
        hits.groupBy("entity", "cls")
        .agg(*aggs)
        .select("entity", "cls", popcnt.alias("n_derivations"))
    )


def _closure_py(edges: set, max_iters: int) -> set:
    """Non-reflexive transitive closure of an ontology-sized (s, o) edge
    set as a Python set fixpoint by iterated squaring — the same math as
    :func:`_transitive_closure_small` without a Spark job per round.
    Same convergence contract: raises after ``max_iters`` squaring
    rounds; a cycle converges (with s==o rows), matching the DataFrame
    twin."""
    clo = set(edges)
    for _ in range(max_iters):
        by_s: dict = {}
        for s, o in clo:
            by_s.setdefault(s, set()).add(o)
        stepped = {
            (s, o2) for s, o in clo for o2 in by_s.get(o, ())
        }
        nxt = clo | stepped
        if len(nxt) == len(clo):
            return clo
        clo = nxt
    raise RuntimeError(
        f"transitive closure did not converge in {max_iters} squaring "
        "rounds — pathologically deep hierarchy"
    )


def _derivation_combos_py(spark, schema_rows, max_iters: int = 16):
    """Ontology-side pre-composition for the fused :func:`rdfs_closure`
    path, computed entirely on the driver from the collected schema
    rows: returns (n_combos, D) where D has one row per (original
    corpus pred ``pred0``, role, entailed class ``cls``, combo ``bit``)
    and ``bit`` densely ids the distinct (lifted pred, role, base
    class) derivation combos that n_derivations counts. Everything here
    is ontology-sized by contract (the broadcast-dimension argument);
    D is created once and broadcast. Returns None when no domain/range
    statements exist (no derivations possible)."""
    sub_prop_e = {(r[0], r[2]) for r in schema_rows if r[1] == SUB_PROP}
    sub_cls_e = {(r[0], r[2]) for r in schema_rows if r[1] == SUB_CLASS}
    dom = {(r[0], r[2]) for r in schema_rows if r[1] == DOMAIN}
    rng = {(r[0], r[2]) for r in schema_rows if r[1] == RANGE}
    if not dom and not rng:
        return None
    sub_prop = _closure_py(sub_prop_e, max_iters)
    sub_cls = _closure_py(sub_cls_e, max_iters)

    # lift map: identity ∪ subPropertyOf closure (original pred → every
    # pred it entails, itself included)
    preds = (
        {p for p, _ in dom} | {p for p, _ in rng}
        | {s for s, _ in sub_prop} | {o for _, o in sub_prop}
    )
    lift = {(p, p) for p in preds} | sub_prop
    # reflexive-closed class map (same construction as rdfs_derivations)
    base_cls = {c for _, c in dom} | {c for _, c in rng}
    cls_map = {(c, c) for c in base_cls} | sub_cls
    cls_of: dict = {}
    for c0, c in cls_map:
        cls_of.setdefault(c0, set()).add(c)
    rows = set()
    for role, side in (("S", dom), ("O", rng)):
        side_of: dict = {}
        for p, c0 in side:
            side_of.setdefault(p, set()).add(c0)
        for pred0, lp in lift:
            for cls0 in side_of.get(lp, ()):
                for cls in cls_of.get(cls0, ()):
                    rows.add((pred0, lp, role, cls0, cls))
    if not rows:
        return None
    combos = sorted({(lp, role, cls0) for _, lp, role, cls0, _ in rows})
    bit_of = {c: i for i, c in enumerate(combos)}
    d = spark.createDataFrame(
        sorted({
            (pred0, role, cls, bit_of[(lp, role, cls0)])
            for pred0, lp, role, cls0, cls in rows
        }),
        ["pred0", "role", "cls", "bit"],
    )
    return len(combos), d


def materialize_inverses(
    triples: DataFrame, inverses: DataFrame
) -> DataFrame:
    """owl:inverseOf materialization: for every declared (pred,
    inv_pred) pair, emit the (obj, inv_pred, subj) triples the corpus
    LICENSES but does not yet assert — the completion step after
    q270-style inverse-predicate DETECTION promotes a discovered pair
    into the ontology. A symmetric property (owl:SymmetricProperty) is
    the self-pair (p, p).

    ``inverses`` is ontology-sized and broadcast; candidates are one
    map-side join, and the only corpus shuffle is the (s, p, o)
    anti-join that suppresses already-asserted facts. Output: the
    MATERIALIZED triples only (union with the input to get the
    completed KG)."""
    cand = (
        triples.join(F.broadcast(inverses), "pred")
        .select(
            F.col("obj").alias("subj"),
            F.col("inv_pred").alias("pred"),
            F.col("subj").alias("obj"),
        )
        .distinct()
    )
    return cand.join(
        triples.select("subj", "pred", "obj"),
        ["subj", "pred", "obj"],
        "left_anti",
    )


def disjointness_audit(
    typed: DataFrame, disjoint: DataFrame
) -> DataFrame:
    """owl:disjointWith consistency check over an entailed type table
    (the output of :func:`rdfs_closure`): every entity entailed as a
    member of BOTH classes of a declared-disjoint pair is an extraction
    or modelling error worth surfacing.

    ``disjoint`` is ontology-sized (cls_a, cls_b) — broadcast twice; the
    corpus-sized ``typed`` table is first semi-filtered to classes that
    appear in ANY disjoint pair, so the entity self-join only ever sees
    the (tiny) potentially-conflicting slice, never all type rows.
    Output: (entity, cls_a, cls_b, n_der_a, n_der_b)."""
    watch = (
        disjoint.select(F.col("cls_a").alias("cls"))
        .unionByName(disjoint.select(F.col("cls_b").alias("cls")))
        .distinct()
    )
    # persisted: both self-join sides read it, and a lazy ``typed`` is
    # usually a full rdfs_closure plan — replaying that twice doubles
    # the audit's cost for no reason
    slim = typed.join(F.broadcast(watch), "cls").persist()
    a = slim.select(
        "entity",
        F.col("cls").alias("cls_a"),
        F.col("n_derivations").alias("n_der_a"),
    )
    b = slim.select(
        "entity",
        F.col("cls").alias("cls_b"),
        F.col("n_derivations").alias("n_der_b"),
    )
    return (
        a.join(b, "entity")
        .join(F.broadcast(disjoint), ["cls_a", "cls_b"])
        .select("entity", "cls_a", "cls_b", "n_der_a", "n_der_b")
    )


def domain_conformance(
    triples: DataFrame,
    schema: DataFrame,
    prefix_map: DataFrame,
    sep: str = ":",
    max_iters: int = 16,
) -> DataFrame:
    """Declared-domain conformance per predicate: for every predicate
    with an rdfs:domain statement, the share of its triples whose
    subject's class (looked up from the id prefix via ``prefix_map``) is
    the declared domain or one of its subclasses. The dirty predicates
    this flags are exactly where extraction wired the wrong entity type
    into the subject slot.

    All three side inputs (domain map, subclass closure, prefix map) are
    ontology-sized and broadcast; the corpus sees map-side joins plus one
    predicate-keyed aggregation. Output: (pred, domain, n_triples,
    n_conforming, conformance)."""
    dom = schema.where(F.col("p") == DOMAIN).select(
        F.col("s").alias("pred"), F.col("o").alias("domain")
    )
    subc = _transitive_closure_small(
        schema.where(F.col("p") == SUB_CLASS).select("s", "o"), max_iters
    ).select(F.col("s").alias("subj_cls"), F.col("o").alias("domain"))
    flagged = (
        triples.join(F.broadcast(dom), "pred")
        .withColumn(
            # substring_index is a LITERAL separator (F.split takes a
            # Java regex — a '.' or '|' sep would silently split on
            # every char and zero out conformance); matches the twin's
            # literal split_part
            "_prefix", F.substring_index(F.col("subj"), sep, 1)
        )
        .join(
            F.broadcast(
                prefix_map.select(
                    F.col("prefix").alias("_prefix"),
                    F.col("cls").alias("subj_cls"),
                )
            ),
            "_prefix",
            "left",
        )
        .join(
            F.broadcast(subc.withColumn("_sub", F.lit(1))),
            ["subj_cls", "domain"],
            "left",
        )
        .withColumn(
            "_ok",
            (F.col("subj_cls") == F.col("domain"))
            | F.col("_sub").isNotNull(),
        )
    )
    return flagged.groupBy("pred", "domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.sum(F.when(F.col("_ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_conforming"),
        F.round(
            F.sum(F.when(F.col("_ok"), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("conformance"),
    )


# ---------------------------------------------------------------------------
# SPARQL 1.1 property paths
# ---------------------------------------------------------------------------
#
# Path spec mini-AST (plain tuples so registry entries stay literal):
#   "pred"                     — a single predicate step
#   ("inv", path)              — ^path (swap subject/object)
#   ("seq", p1, p2, ...)       — p1 / p2 / ...
#   ("alt", p1, p2, ...)       — p1 | p2 | ...
#   ("plus", path, k)          — path+ bounded to k hops (SPARQL's
#                                unbounded + is a fixpoint; a KG with
#                                a known ontology depth declares k and
#                                gets a deterministic, explainable plan)


def property_path(
    triples: DataFrame, path, distinct_steps: bool = True
) -> DataFrame:
    """Evaluate a SPARQL property-path expression over (subj, pred,
    obj) triples to the DISTINCT (s, o) pair relation it denotes.

    Composition is left-to-right equi-joins; ``distinct_steps`` keeps a
    DISTINCT after every composition so bounded-star expansion is
    semi-naive (a pair reachable along many walks is carried once, not
    once per walk — the difference between |V|·depth and path-count
    blowup on dense graphs)."""

    def _dedup(df: DataFrame) -> DataFrame:
        return df.distinct() if distinct_steps else df

    def ev(p) -> DataFrame:
        if isinstance(p, str):
            return triples.where(F.col("pred") == p).select(
                F.col("subj").alias("s"), F.col("obj").alias("o")
            )
        op = p[0]
        if op == "inv":
            return ev(p[1]).select(
                F.col("o").alias("s"), F.col("s").alias("o")
            )
        if op == "alt":
            out = ev(p[1])
            for sub in p[2:]:
                out = out.unionByName(ev(sub))
            return _dedup(out)
        if op == "seq":
            out = ev(p[1])
            for sub in p[2:]:
                right = ev(sub)
                out = _dedup(
                    out.alias("l")
                    .join(
                        right.alias("r"), F.col("l.o") == F.col("r.s")
                    )
                    .select(
                        F.col("l.s").alias("s"), F.col("r.o").alias("o")
                    )
                )
            return out
        if op == "plus":
            base = _dedup(ev(p[1]))
            k = int(p[2])
            if k < 1:
                # k=0 would silently return path^1 (range(k-1) empty) —
                # a nonsensical bound must fail loudly instead
                raise ValueError(f"('plus', path, k) needs k >= 1, got {k}")
            reach = base
            frontier = base
            for _ in range(k - 1):
                frontier = _dedup(
                    frontier.alias("l")
                    .join(base.alias("r"), F.col("l.o") == F.col("r.s"))
                    .select(
                        F.col("l.s").alias("s"), F.col("r.o").alias("o")
                    )
                )
                reach = _dedup(reach.unionByName(frontier))
            return reach
        raise ValueError(f"unknown path op: {p!r}")

    return ev(path).distinct()

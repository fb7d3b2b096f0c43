"""Data-contract validation — the dbt-test / Deequ-style quality gate a
pipeline runs before promoting a snapshot: uniqueness, not-null, range and
referential-integrity rules, each reduced to a (rule, n_checked,
n_violations) row. The reference has no equivalent (its corpus is a fixed
benchmark); any 10^12-row ingest needs this in front of every commit.

Scale shape: every rule is a single aggregate with map-side partial combine
(not-null/range are one scan; uniqueness is one groupBy-free
count vs count-distinct pass; FK is a broadcast-or-SMJ left-anti count).
The report is a union of 1-row frames — negligible. Violating ROWS (not
counts) are a `.where()` away with the same predicates; the report form is
what gets persisted next to the snapshot manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _report_row(name: str, checked, violations) -> DataFrame:
    return checked.crossJoin(violations).select(
        F.lit(name).alias("rule"),
        F.col("n_checked").cast("long"),
        F.col("n_violations").cast("long"),
    )


def rule_not_null(df: DataFrame, col: str) -> DataFrame:
    c = df.agg(F.count(F.lit(1)).alias("n_checked"))
    v = df.agg(
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("n_violations")
    )
    return _report_row(f"not_null:{col}", c, v)


def rule_unique(df: DataFrame, col: str) -> DataFrame:
    a = df.agg(
        F.count(col).alias("n_checked"),
        (F.count(col) - F.countDistinct(col)).alias("n_violations"),
    )
    return a.select(
        F.lit(f"unique:{col}").alias("rule"),
        F.col("n_checked").cast("long"),
        F.col("n_violations").cast("long"),
    )


def rule_in_range(df: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    c = df.agg(F.count(F.lit(1)).alias("n_checked"))
    v = df.agg(
        F.sum(
            F.when(
                F.col(col).isNull()
                | (F.col(col) < lo)
                | (F.col(col) > hi),
                1,
            ).otherwise(0)
        ).alias("n_violations")
    )
    return _report_row(f"range:{col}", c, v)


def rule_foreign_key(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    c = child.agg(F.count(F.lit(1)).alias("n_checked"))
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    v = orphans.agg(F.count(F.lit(1)).alias("n_violations"))
    return _report_row(f"fk:{child_key}", c, v)


def contract_report(rules: list[DataFrame]) -> DataFrame:
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out


def key_skew_profile(
    df: DataFrame, key_cols: list[str], top_k: int = 20
) -> DataFrame:
    """Join/partition-key skew audit — the measurement BEHIND every
    salting decision this engine makes (P3, A5's salted dedup, the
    df-cut in ngram_jaccard): before shuffling 100 TB on a key, ask how
    hot its hottest values are. A key whose top value owns 30% of the
    rows will straggle one reducer regardless of partition count; this
    report is the evidence for salting it (or broadcasting the other
    side).

    One count aggregate on the key (the same shuffle the join would
    do — at a fraction of the width), one 1-row total broadcast, one
    TakeOrdered for the top-k. Output: top_k rows (key string-joined
    for schema stability, n, share 6 dp, cum_share 6 dp, rank) ordered
    hottest-first; share·n_keys ≫ 1 ⇒ skew."""
    counts = df.groupBy(
        *[F.col(c) for c in key_cols]
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.agg(
        F.sum("n").cast("double").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    top = (
        counts.orderBy(F.desc("n"), *[F.asc(c) for c in key_cols])
        .limit(top_k)
        .crossJoin(F.broadcast(tot))
    )
    w = Window.orderBy(F.desc("n"), *[F.asc(c) for c in key_cols])
    return top.select(
        F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols]).alias(
            "key"
        ),
        "n",
        "n_keys",
        F.round(F.col("n") / F.col("n_rows"), 6).alias("share"),
        F.round(
            F.sum("n").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            / F.col("n_rows"),
            6,
        ).alias("cum_share"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


def k_anonymity_audit(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    governance gate a training-data release runs before publishing
    anything row-level: every row whose QI group has fewer than k
    members is re-identifiable by joining the QI columns against an
    external table. One QI-keyed count (the same shuffle a dedup would
    do), one 1-row rollup. Output: 1 row (n_rows, n_groups,
    min_group_size, n_violating_rows, violating_share 6 dp,
    k_satisfied)."""
    g = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return g.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("n").cast("long").alias("min_group_size"),
        F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_violating_rows"),
    ).select(
        "n_rows",
        "n_groups",
        "min_group_size",
        "n_violating_rows",
        F.round(
            F.col("n_violating_rows") / F.col("n_rows").cast("double"), 6
        ).alias("violating_share"),
        (F.col("n_violating_rows") == 0).alias("k_satisfied"),
    )


def l_diversity_audit(
    df: DataFrame, qi_cols: list[str], sensitive_col, l_min: int = 3
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the companion
    gate to k_anonymity_audit: a QI group can be large enough for k yet
    HOMOGENEOUS in the sensitive attribute, so membership alone leaks
    the secret. Every QI group must carry at least ``l_min`` DISTINCT
    sensitive values; groups below that are homogeneity-attackable.

    Same shuffle shape as the k gate (one QI-keyed aggregate — the
    distinct count partial-aggregates — plus a 1-row rollup). Output:
    1 row (n_rows, n_groups, min_diversity, n_violating_groups,
    n_violating_rows, violating_share 6 dp, l_satisfied)."""
    sens = F.col(sensitive_col) if isinstance(sensitive_col, str) else sensitive_col
    g = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct(sens).cast("long").alias("ndv"),
    )
    return g.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("ndv").cast("long").alias("min_diversity"),
        F.sum((F.col("ndv") < l_min).cast("long"))
        .cast("long")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("ndv") < l_min, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_violating_rows"),
    ).select(
        "n_rows",
        "n_groups",
        "min_diversity",
        "n_violating_groups",
        "n_violating_rows",
        F.round(
            F.col("n_violating_rows") / F.col("n_rows").cast("double"), 6
        ).alias("violating_share"),
        (F.col("n_violating_groups") == 0).alias("l_satisfied"),
    )


def t_closeness_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col,
    t: float = 0.35,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    third rung of the release-gate ladder after k_anonymity_audit and
    l_diversity_audit: a QI group can be large (k) and varied (l) yet
    still SKEWED — if 90% of one group carries the rare sensitive value
    that is 5% globally, membership shifts an attacker's posterior
    enormously. The gate bounds, per QI group, the total-variation
    distance between the group's sensitive-value distribution and the
    corpus-wide one:

      TVD(g) = ½ Σ_v |n_gv/n_g − n_v/N|

    Exact-integer form: over the common denominator n_g·N every term is
    |n_gv·N − n_v·n_g|, and values ABSENT from the group contribute
    Σ_missing n_v·n_g = (N − Σ_present n_v)·n_g — so the whole distance
    is one BIGINT tree per group with a single final division, and both
    engines round identically (no per-value float sums). Overflow bound:
    n_gv·N < 2⁶³ ⇒ N ≲ 3·10⁹ rows; beyond that pre-aggregate counts to
    a coarser sensitive domain or compute in DECIMAL.

    Shuffle shape: one (QI, v)-keyed count (the dedup shuffle), one
    window re-use of that partitioning for n_g, a broadcast of the
    value-domain counts (|domain| rows) and the 1-row N, then a QI-keyed
    rollup — no cross join of groups × values is ever materialized.
    Output: 1 row (n_rows, n_groups, max_tvd 6 dp, n_violating_groups
    with ROUND(tvd,6) > t, n_violating_rows, t_satisfied)."""
    sens = (
        F.col(sensitive_col) if isinstance(sensitive_col, str) else sensitive_col
    )
    cell = df.groupBy(
        *[F.col(c) for c in qi_cols], sens.alias("_v")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_gv"))
    vdom = cell.groupBy("_v").agg(F.sum("n_gv").cast("long").alias("n_v"))
    tot = vdom.agg(F.sum("n_v").cast("long").alias("n_total"))
    w = Window.partitionBy(*qi_cols)
    # NULL is a sensitive VALUE like any other (groupBy already keeps the
    # NULL group) — the value-domain attach must be null-SAFE or NULL
    # rows silently drop here, distorting every group's TVD and deleting
    # all-NULL groups from the audit entirely
    vd2 = vdom.withColumnRenamed("_v", "_v2")
    per_cell = (
        cell.withColumn("n_g", F.sum("n_gv").over(w).cast("long"))
        .join(F.broadcast(vd2), F.col("_v").eqNullSafe(F.col("_v2")))
        .drop("_v2")
        .crossJoin(F.broadcast(tot))
    )
    grp = per_cell.groupBy(*qi_cols).agg(
        F.first("n_g").alias("n_g"),
        F.first("n_total").alias("n_total"),
        F.sum(
            F.abs(F.col("n_gv") * F.col("n_total") - F.col("n_v") * F.col("n_g"))
        )
        .cast("long")
        .alias("dev_present"),
        F.sum("n_v").cast("long").alias("nv_present"),
    )
    tvd = F.round(
        (
            F.col("dev_present")
            + (F.col("n_total") - F.col("nv_present")) * F.col("n_g")
        )
        / (2.0 * F.col("n_g") * F.col("n_total")),
        6,
    )
    g = grp.select(
        F.col("n_g"),
        tvd.alias("tvd"),
    )
    return g.agg(
        F.sum("n_g").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.max("tvd").alias("max_tvd"),
        F.sum((F.col("tvd") > t).cast("long"))
        .cast("long")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("tvd") > t, F.col("n_g")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_violating_rows"),
    ).select(
        "n_rows",
        "n_groups",
        "max_tvd",
        "n_violating_groups",
        "n_violating_rows",
        (F.col("n_violating_groups") == 0).alias("t_satisfied"),
    )


PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "card16": r"\b[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}\b",
}


def pii_scan(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """PII-pattern scan — the redaction-planning census a corpus runs
    before training: per document group, how many documents contain
    each PII-shaped pattern (email / phone / IPv4 / 16-digit card) and
    the total match count. Patterns are deliberately SHAPE-level
    (regex, no checksum validation) — this is a detection-budget
    estimate, not a validator; route hits to a real redactor.

    Pure scan projection (one regexp_extract_all per pattern, fused in
    one pass over the corpus) + one group-keyed aggregate. Output: one
    row per (group, pattern): (grp, pattern, n_docs_hit, n_matches,
    doc_rate 6 dp), ordered."""
    cnt_cols = [
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        ).alias(f"_c_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    counted = docs.select(F.col(group_col).alias("grp"), *cnt_cols)
    per = counted.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("_n_docs"),
        *[
            x
            for name in PII_PATTERNS
            for x in (
                F.sum(F.when(F.col(f"_c_{name}") > 0, 1).otherwise(0))
                .cast("long")
                .alias(f"_h_{name}"),
                F.sum(f"_c_{name}").cast("long").alias(f"_m_{name}"),
            )
        ],
    )
    rows = [
        F.struct(
            F.lit(name).alias("pattern"),
            F.col(f"_h_{name}").alias("n_docs_hit"),
            F.col(f"_m_{name}").alias("n_matches"),
        )
        for name in PII_PATTERNS
    ]
    return (
        per.select(
            "grp", "_n_docs", F.explode(F.array(*rows)).alias("e")
        )
        .select(
            "grp",
            F.col("e.pattern").alias("pattern"),
            F.col("e.n_docs_hit").alias("n_docs_hit"),
            F.col("e.n_matches").alias("n_matches"),
            F.round(
                F.col("e.n_docs_hit") / F.col("_n_docs").cast("double"), 6
            ).alias("doc_rate"),
        )
        .orderBy("grp", "pattern")
    )


def fd_audit(
    df: DataFrame, lhs: list[str], rhs: str, examples: int = 5
) -> DataFrame:
    """Functional-dependency audit (lhs → rhs): which determinant groups
    carry MORE than one distinct dependent value — the schema-repair
    signal behind entity canonicalization (one mesh_id → many canonical
    names means the dictionary merge broke) and the precondition check
    for golden_record-style fusion rules.

    One lhs-keyed aggregate (exact countDistinct per group is fine —
    the per-group cardinality is what we're measuring), violators only,
    with up to ``examples`` offending dependent values collected via
    slice(sort_array(collect_set(...))) — bounded output per group,
    deterministic order. NULL dependent values count toward NEITHER
    n_distinct_rhs nor the examples (countDistinct/collect_set both
    skip NULLs): an FD violated only by NULLs is a completeness issue
    for rule_not_null, not a contradiction. Output: (lhs..., n_rows, n_distinct_rhs,
    example_values) for violating groups, ordered; empty ⇒ the FD
    holds."""
    g = df.groupBy(*[F.col(c) for c in lhs]).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct(rhs).cast("long").alias("n_distinct_rhs"),
        F.slice(
            F.sort_array(F.collect_set(F.col(rhs).cast("string"))),
            1,
            examples,
        ).alias("example_values"),
    )
    return g.where(F.col("n_distinct_rhs") > 1).orderBy(*lhs)


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column profiler — the first thing anyone runs on unfamiliar data:
    per column, row count, null count/rate, exact distinct count, and
    the most frequent value with its share (deterministic value-asc
    tie-break). At 10¹² rows swap countDistinct for approx_count_
    distinct and keep the same output contract; exact is the oracle
    default here.

    ONE shared aggregate computes every column's count/null/distinct
    cells in a single corpus pass; only the per-column top-value argmax
    needs its own (col, value) count job. An all-NULL column still
    emits its row (top joined with a TRUE-condition left join, never a
    cross join that would vanish on an empty top side) with
    top_value/top_share NULL. Output: one row per column (col, n_rows,
    n_nulls, null_rate, n_distinct, top_value, top_share), 6 dp,
    ordered by col."""
    shared = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            x
            for c in cols
            for x in (
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"_nn_{c}"),
                F.countDistinct(F.col(c).cast("string"))
                .cast("long")
                .alias(f"_nd_{c}"),
            )
        ],
    )
    parts = []
    for c in cols:
        stats = shared.select(
            "n_rows",
            F.col(f"_nn_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
        )
        top = (
            df.select(F.col(c).cast("string").alias("v"))
            .where(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("v"))
            .limit(1)
            .select(
                F.col("v").alias("top_value"), F.col("n").alias("top_n")
            )
        )
        parts.append(
            stats.join(F.broadcast(top), F.lit(True), "left").select(
                F.lit(c).alias("col"),
                "n_rows",
                "n_nulls",
                F.round(
                    F.col("n_nulls") / F.col("n_rows").cast("double"), 6
                ).alias("null_rate"),
                "n_distinct",
                "top_value",
                F.round(
                    F.col("top_n") / F.col("n_rows").cast("double"), 6
                ).alias("top_share"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col")


def schema_match(
    left: DataFrame,
    right: DataFrame,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Instance-based schema matching (the value-overlap half of classic
    matchers like LSD/COMA): given two tables that SHOULD join or union
    but come from different producers, score every (left column, right
    column) candidate by the Jaccard similarity of their distinct value
    sets — the signal that finds `cust_nation_id` ≡ `s_nationkey` when
    names share nothing. A KG-construction ingest runs this before
    writing a mapping config, not instead of one: the output ranks
    candidates for a human (or an LLM labeler) to confirm.

    Scale shape: each side is melted into (col, value) pairs in ONE
    scan (a column-dimension union of projections, no shuffle), then
    distinct-ed — the same shuffle an exact dedup costs, keyed by value
    so one column's hot domain cannot skew another's. Intersections
    come from a single value-keyed join of the two distinct sets; the
    full m×n candidate matrix is a crossJoin of two COLUMN-dimension
    stat tables (m, n ≤ dozens — dimension-table legality) left-joined
    with the intersection counts. At 100 TB melt a deterministic sample
    per column first (values are only evidence, not output).

    Output: one row per (left_col, right_col): n_left, n_right,
    n_common, jaccard 6 dp, rank of the pair within left_col — ordered
    by (left_col, rank)."""

    def melt(df: DataFrame, cols: list[str], name: str) -> DataFrame:
        parts = [
            df.select(
                F.lit(c).alias(name), F.col(c).cast("string").alias("v")
            ).where(F.col("v").isNotNull())
            for c in cols
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()

    lv = melt(left, left_cols, "left_col")
    rv = melt(right, right_cols, "right_col")
    # the matrix must carry EVERY requested column, including one whose
    # values are all NULL (a dead field is exactly what this audit is
    # run to discover) — anchor stats on the literal column dimension,
    # not on whichever columns survived the melt
    spark = left.sparkSession
    lstat = (
        spark.createDataFrame([(c,) for c in left_cols], "left_col string")
        .join(
            lv.groupBy("left_col").agg(
                F.count(F.lit(1)).cast("long").alias("n_left")
            ),
            "left_col",
            "left",
        )
        .withColumn("n_left", F.coalesce("n_left", F.lit(0)).cast("long"))
    )
    rstat = (
        spark.createDataFrame([(c,) for c in right_cols], "right_col string")
        .join(
            rv.groupBy("right_col").agg(
                F.count(F.lit(1)).cast("long").alias("n_right")
            ),
            "right_col",
            "left",
        )
        .withColumn("n_right", F.coalesce("n_right", F.lit(0)).cast("long"))
    )
    inter = (
        lv.join(rv, "v")
        .groupBy("left_col", "right_col")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    matrix = (
        lstat.crossJoin(F.broadcast(rstat))
        .join(inter, ["left_col", "right_col"], "left")
        .withColumn("n_common", F.coalesce("n_common", F.lit(0)).cast("long"))
    )
    denom = (
        F.col("n_left") + F.col("n_right") - F.col("n_common")
    ).cast("double")
    jac = F.when(
        denom > 0, F.round(F.col("n_common") / denom, 6)
    ).otherwise(F.lit(0.0))
    w = Window.partitionBy("left_col").orderBy(
        F.desc("jaccard"), F.asc("right_col")
    )
    return (
        matrix.select(
            "left_col",
            "right_col",
            "n_left",
            "n_right",
            "n_common",
            jac.alias("jaccard"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .orderBy("left_col", "rank")
    )


def fairness_audit(
    df: DataFrame,
    group_col: str,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Group-fairness audit of a binary classifier (the labeling
    functions, quality gates, and filter models this engine trains data
    FOR): per protected/population group, selection rate (demographic
    parity), TPR (equal opportunity) and FPR (equalized odds), plus each
    group's gap to the best-off group — the report a datacard attaches
    before a filter is allowed to gate a corpus, because a quality
    filter that silently drops one language's documents at 3× the rate
    of another's is a mixture decision nobody signed off on.

    One group-keyed conditional aggregate over the corpus (exact integer
    counts, map-side combine), then windows over the group DIMENSION for
    the max rates (dimension-table legality). Rates are single exact
    divisions rounded 6 dp; gaps compare the ROUNDED rates so both
    engines agree bit-for-bit. Groups without positives (negatives)
    report NULL tpr (fpr) and are skipped by the corresponding max.

    Output: one row per group (grp, n, n_pos, pred_rate, base_rate,
    tpr, fpr, dp_gap, tpr_gap), ordered by grp."""
    y = F.col("_y")
    p = F.col("_p")
    g = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(label_col).cast("int").alias("_y"),
            F.col(pred_col).cast("int").alias("_p"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(y).cast("long").alias("n_pos"),
            F.sum(p).cast("long").alias("n_sel"),
            F.sum(F.when((y == 1) & (p == 1), 1).otherwise(0))
            .cast("long")
            .alias("n_tp"),
            F.sum(F.when((y == 0) & (p == 1), 1).otherwise(0))
            .cast("long")
            .alias("n_fp"),
        )
    )
    pred_rate = F.round(F.col("n_sel") / F.col("n").cast("double"), 6)
    base_rate = F.round(F.col("n_pos") / F.col("n").cast("double"), 6)
    tpr = F.round(
        F.when(
            F.col("n_pos") > 0, F.col("n_tp") / F.col("n_pos").cast("double")
        ),
        6,
    )
    fpr = F.round(
        F.when(
            F.col("n") - F.col("n_pos") > 0,
            F.col("n_fp") / (F.col("n") - F.col("n_pos")).cast("double"),
        ),
        6,
    )
    r = g.select(
        "grp", "n", "n_pos",
        pred_rate.alias("pred_rate"),
        base_rate.alias("base_rate"),
        tpr.alias("tpr"),
        fpr.alias("fpr"),
    )
    wall = Window.partitionBy(F.lit(1))
    return r.select(
        "*",
        F.round(F.max("pred_rate").over(wall) - F.col("pred_rate"), 6).alias(
            "dp_gap"
        ),
        F.when(
            F.col("tpr").isNotNull(),
            F.round(F.max("tpr").over(wall) - F.col("tpr"), 6),
        ).alias("tpr_gap"),
    ).orderBy("grp")


def benford_audit(
    df: DataFrame,
    amount_cents_col: str,
) -> DataFrame:
    """First-significant-digit audit against Benford's law (Newcomb 1881,
    Benford 1938; Nigrini's fraud-audit standard) — the data-quality
    screen for financial/measurement columns that spot-checks whether a
    feed was fabricated, truncated, or unit-mangled: naturally occurring
    multi-scale amounts follow P(d) = log10(1 + 1/d), while synthetic or
    capped feeds pile up on specific lead digits.

    ``amount_cents_col`` must hold EXACT positive integers (cents —
    integerize upstream, ab_effect's contract; zero/negative/NULL rows
    are excluded and reported in n_excluded). The first significant
    digit is taken from the INTEGER's decimal string — pure string math,
    no log10 float boundary to disagree at exact powers of ten. One
    9-bucket aggregate (map-side partial); the chi-square
    goodness-of-fit statistic Σ(o−e)²/e·N is summed over micro-rounded
    BIGINT per-digit terms (associative — no float reduction order) and
    replicated onto every row as the verdict column (9-row output keeps
    the per-digit detail hashable). Output: digit, n, obs_frac,
    exp_frac, dev (obs−exp), n_total, n_excluded, chi2 — 6 dp."""
    import math

    cents = F.col(amount_cents_col).cast("long")
    base = df.select(cents.alias("_c")).select(
        F.when(F.col("_c") > 0, F.col("_c")).alias("_c")
    )
    digits = base.select(
        F.substring(F.col("_c").cast("string"), 1, 1).cast("int").alias(
            "digit"
        )
    )
    counts = (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
    )
    # left-join the full digit domain so absent digits report n = 0
    # (a 9-row dimension literal; exclusions = the NULL-digit bucket)
    dom = F.broadcast(
        digits.sparkSession.createDataFrame(
            [(d, round(math.log10(1.0 + 1.0 / d), 6)) for d in range(1, 10)],
            "digit int, exp_frac double",
        )
    )
    per = dom.join(
        counts.where(F.col("digit").isNotNull()), "digit", "left"
    ).select(
        "digit",
        F.coalesce(F.col("n_raw"), F.lit(0)).cast("long").alias("n"),
        "exp_frac",
    )
    excl = counts.where(F.col("digit").isNull()).agg(
        F.coalesce(F.sum("n_raw"), F.lit(0)).cast("long").alias("n_excluded")
    )
    tot = per.agg(F.sum("n").cast("long").alias("n_total"))
    nt = F.col("n_total").cast("double")
    obs = F.col("n") / nt
    chi_micro = F.when(
        F.col("n_total") > 0,
        F.round(
            (obs - F.col("exp_frac"))
            * (obs - F.col("exp_frac"))
            / F.col("exp_frac")
            * nt
            * 1000000.0,
            0,
        ).cast("long"),
    )
    w = Window.partitionBy(F.lit(1))
    return (
        per.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(excl))
        .select(
            "digit",
            "n",
            F.round(F.when(F.col("n_total") > 0, obs), 6).alias("obs_frac"),
            "exp_frac",
            F.round(
                F.when(F.col("n_total") > 0, obs - F.col("exp_frac")), 6
            ).alias("dev"),
            "n_total",
            "n_excluded",
            F.round(F.sum(chi_micro).over(w) / 1000000.0, 6).alias("chi2"),
        )
        .orderBy("digit")
    )


def dp_release_audit(
    df: DataFrame,
    group_col: str,
    epsilon: float = 0.5,
    release_tag: str = "r0",
) -> DataFrame:
    """ε-differential-privacy histogram release (Laplace mechanism,
    Dwork et al. 2006; sensitivity 1 for disjoint-group counts) plus the
    utility audit a governance gate wants next to it: per group the true
    count, the noised release, and the injected absolute error at the
    chosen ε.

    DETERMINISM SEAM (document, don't hide): real DP noise must be a
    fresh secret per release; here the Laplace draw is derived from
    md5(release_tag ‖ group) — u = (hex8 % 10^6 + 0.5)/10^6,
    lap = −(1/ε)·sign(u−½)·ln(1−2|u−½|) — so tests, reruns, and the
    DuckDB twin replay bit-identical releases. Swap the tag for a
    per-release secret seed in production; the ε accounting and the
    inverse-CDF math are the real thing, only the entropy source is the
    test seam. |u−½| ≤ ½−10⁻⁶ keeps ln's argument ≥ 2·10⁻⁶, so noise is
    bounded by ~13.1/ε. The noise is micro-rounded to BIGINT before the
    integer release so engine ulp differences in ln cannot move the
    output.

    One group-count aggregate + a narrow projection — no second pass,
    no broadcast. Output: (group, true_count, noisy_count, abs_err,
    epsilon) — at 10^12 rows the plan is the same histogram."""
    g = (
        df.select(F.col(group_col).cast("string").alias("grp"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("long").alias("true_count"))
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(release_tag + "|"), F.col("grp"))), 1, 8),
        16,
        10,
    ).cast("long")
    u = ((h % 1000000).cast("double") + 0.5) / 1000000.0
    w = u - 0.5
    lap = (
        -(1.0 / float(epsilon))
        * F.signum(w)
        * F.log(1.0 - 2.0 * F.abs(w))
    )
    noise_int = (
        (F.round(lap * 1000000.0, 0).cast("long") + F.lit(500000).cast("long"))
        .cast("long")
    )
    # floor((micro + 5·10^5)/10^6) = round-half-up of the micro noise,
    # in pure integer ops (no DIV-vs-// negative-truncation mismatch)
    noisy = F.col("true_count") + F.floor(
        noise_int.cast("double") / 1000000.0
    ).cast("long")
    return (
        g.withColumn("noisy_count", noisy)
        .select(
            F.col("grp").alias("grp"),
            "true_count",
            "noisy_count",
            F.abs(F.col("noisy_count") - F.col("true_count"))
            .cast("long")
            .alias("abs_err"),
            F.lit(float(epsilon)).alias("epsilon"),
        )
    )

"""Lexico-syntactic hypernym harvesting (Hearst, COLING 1992) — the
classic "X such as Y" patterns that bootstrap an is-a backbone for a
knowledge graph straight from raw text, upstream of the model-scored
relation pipeline (plans/pipeline.py): bran's CDR benchmark ships a
curated MeSH hierarchy (SURVEY.md §2 J3/S5), but an open-domain corpus
has to MINE its hierarchy, and Hearst patterns remain the standard
high-precision first pass (they seed WebIsA, KnowItAll, and most taxonomy
-induction baselines).

Four patterns, one corpus scan: each pattern's matches are extracted with
`regexp_extract_all` (JVM-side, whole-stage codegen — no Python in the
path), zipped into (pattern, hypernym, tail) structs, concatenated, and
exploded ONCE — so adding a pattern widens the projection instead of
adding a scan. Noun phrases are deliberately single-token (`\\w+`): the
precision-recall trade of multi-token NP chunking needs a tagger this
container doesn't ship; the seam is the regex table below, not the plan.

Scale shape: scan-projection-explode (narrow, no shuffle) for matching;
support aggregation is one (hyponym, hypernym)-keyed groupBy — the same
shuffle a vocab count costs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tail of a coordinated list: "a", "a, b", "a, b and c", "a or b", ...
_TAIL = r"(\w+(?:, \w+)*(?:,? (?:and|or) \w+)?)"

# pattern name -> (regex, hypernym group, tail group)
HEARST_PATTERNS: "dict[str, tuple[str, int, int]]" = {
    "such_as": (r"(\w+) such as " + _TAIL, 1, 2),
    "and_other": (r"(\w+(?:, \w+)*),? and other (\w+)", 2, 1),
    "including": (r"(\w+),? including " + _TAIL, 1, 2),
    "especially": (r"(\w+),? especially " + _TAIL, 1, 2),
}

# splits a coordinated tail into its member tokens
_TAIL_SPLIT = r",? (?:and|or) |, "


def hearst_hypernyms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Extract (hyponym, hypernym) candidates from every Hearst-pattern
    match in the corpus. One scan: per pattern, regexp_extract_all pulls
    the hypernym and tail groups of ALL matches (the two arrays align
    by construction — same regex, same subject), zip_with pairs them,
    one concat + explode flattens across patterns, and the coordinated
    tail is split into individual hyponyms. Docs without matches vanish
    at the explode. Output: (doc_id, hyponym, hypernym, pattern), one
    row per extracted pair occurrence."""
    def _pair(name):
        # binary lambda (zip_with inspects arity); name bound via closure
        return lambda h, t: F.struct(
            F.lit(name).alias("pattern"), h.alias("hyper"), t.alias("tail")
        )

    arrs = []
    for name, (pat, hg, tg) in HEARST_PATTERNS.items():
        hyp = F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(hg))
        tail = F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(tg))
        arrs.append(F.zip_with(hyp, tail, _pair(name)))
    m = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.concat(*arrs)).alias("_m")
    )
    return m.select(
        "doc_id",
        F.explode(F.split(F.col("_m.tail"), _TAIL_SPLIT)).alias("hyponym"),
        F.col("_m.hyper").alias("hypernym"),
        F.col("_m.pattern").alias("pattern"),
    )


def hearst_support(matches: DataFrame) -> DataFrame:
    """Aggregate match-level evidence into edge-level support — the
    filterable table a taxonomy induction actually consumes: document
    support beats raw mention count (one listicle repeating a pair 50×
    is one vote), and the pattern set is the precision signal (a pair
    seen under 2+ independent patterns is far more reliable). One
    (hyponym, hypernym)-keyed aggregate. Output: (hyponym, hypernym,
    n_docs, n_mentions, patterns comma-joined sorted), highest-support
    first with a deterministic tie-break."""
    return (
        matches.groupBy("hyponym", "hypernym")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_mentions"),
            F.array_join(F.sort_array(F.collect_set("pattern")), ",").alias(
                "patterns"
            ),
        )
        .orderBy(F.desc("n_docs"), F.asc("hyponym"), F.asc("hypernym"))
    )

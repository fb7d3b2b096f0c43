"""PubTator source parser (S1): round-trip a synthetic PubTator file."""

from __future__ import annotations

from bran_spark.sources.pubtator import pubtator_tables

SAMPLE = """\
100|t|aspirin causes headache
100|a|we observed aspirin toxicity and headache onset
100\t0\t7\taspirin\tChemical\tD001241
100\t15\t23\theadache\tDisease\tD006261
100\t36\t43\taspirin\tChemical\tD001241|D999999
100\t55\t63\tunlinked\tDisease\t-1
100\tCID\tD001241\tD006261

200|t|plain title
200|a|no annotations here
"""


def test_pubtator_roundtrip(spark, tmp_path):
    p = tmp_path / "corpus.pubtator"
    p.write_text(SAMPLE)
    docs, mentions, rels = pubtator_tables(spark, str(p))

    d = {r.doc_id: r.spans for r in docs.collect()}
    assert set(d) == {"100", "200"}
    spans = d["100"]
    assert spans[0].kind == "title" and spans[0].offset == 0
    assert spans[1].kind == "body" and spans[1].offset == len(spans[0].text) + 1
    full = spans[0].text + " " + spans[1].text

    m = mentions.orderBy("start", "mesh_id").collect()
    # composite D001241|D999999 exploded; '-1' dropped
    assert [x.mesh_id for x in m] == ["D001241", "D006261", "D001241", "D999999"]
    for x in m:
        assert full[x.start : x.end] == x.text
    assert len({x.mention_id for x in m}) == len(m)

    r = rels.collect()
    assert len(r) == 1 and r[0].chem_mesh == "D001241" and r[0].dis_mesh == "D006261"

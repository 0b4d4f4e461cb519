"""Port of the reference's ranking suite (tests/test_ranking.py) to the
DataFrame-backed Ranking — same fixtures, same expected outputs."""

import math

import pytest

from sparkforward.ranking import Ranking

RUN = {
    "q1": {"d0": 1, "d1": 2, "d2": 300},
    "q2": {"d0": 4, "d1": 5, "d2": 600, "d3": 7},
}
QUERIES = {"q1": "query 1", "q2": "query 2"}


@pytest.fixture()
def ranking(spark):
    return Ranking.from_run(spark, RUN)


@pytest.fixture()
def ranking_q(spark):
    return Ranking.from_run(spark, RUN, queries=QUERIES)


def test_properties(ranking):
    assert ranking.q_ids() == {"q1", "q2"}
    assert not ranking.has_queries


def test_attach_queries(spark, ranking, ranking_q):
    assert ranking_q.has_queries
    qmap = {
        r["q_id"]: r["query"]
        for r in ranking_q.df.select("q_id", "query").distinct().collect()
    }
    assert qmap == QUERIES
    # incomplete queries raise (ref ranking.py:24-25)
    with pytest.raises(ValueError):
        Ranking.from_run(spark, RUN, queries={"qx": "other"})
    # superset is fine
    more = {"qx": "other", **QUERIES}
    assert Ranking.from_run(spark, RUN, queries=more) == ranking_q


def test_eq(spark, ranking):
    r1 = Ranking.from_run(spark, {"q1": {"d1": 1, "d2": 2}})
    r2 = Ranking.from_run(spark, {"q1": {"d2": 2, "d1": 1}})
    r3 = Ranking.from_run(spark, {"q1": {"d1": 2, "d2": 3}})
    r4 = Ranking.from_run(spark, {"q1": {"d1": 1, "d2": 2}, "q2": {}})
    assert r1 == r2
    assert r1 != r3
    assert r1 == r4
    assert r1 != "string"


def test_operators(spark, ranking, ranking_q):
    assert ranking + 0 == ranking
    assert ranking * 1 == ranking
    assert ranking + 1 == Ranking.from_run(
        spark,
        {"q1": {"d0": 2, "d1": 3, "d2": 301}, "q2": {"d0": 5, "d1": 6, "d2": 601, "d3": 8}},
    )
    assert ranking * 2 == Ranking.from_run(
        spark,
        {"q1": {"d0": 2, "d1": 4, "d2": 600}, "q2": {"d0": 8, "d1": 10, "d2": 1200, "d3": 14}},
    )
    assert 1 + ranking == ranking + 1
    assert 2 * ranking == ranking * 2
    assert ranking * 2 == ranking + ranking
    assert (ranking_q + 1).has_queries
    assert (ranking_q * 2).has_queries
    assert (ranking_q + ranking).has_queries
    # missing scores are zero (ref ranking.py:196-200)
    other = Ranking.from_run(spark, {"q1": {"d0": 1, "d3": 1}, "q3": {"d0": 1}})
    assert ranking + other == Ranking.from_run(
        spark,
        {
            "q1": {"d0": 2, "d1": 2, "d2": 300, "d3": 1},
            "q2": {"d0": 4, "d1": 5, "d2": 600, "d3": 7},
            "q3": {"d0": 1},
        },
    )


def test_cut(ranking, ranking_q, spark):
    assert ranking.cut(2) == Ranking.from_run(
        spark, {"q1": {"d2": 300, "d1": 2}, "q2": {"d2": 600, "d3": 7}}
    )
    assert ranking_q.cut(2).has_queries


def test_normalize(spark, ranking_q):
    assert Ranking.from_run(
        spark, {"q1": {"d0": 1, "d1": 2, "d2": 3}, "q2": {"d0": 4, "d1": 5, "d2": 6}}
    ).normalize() == Ranking.from_run(
        spark,
        {"q1": {"d0": 0, "d1": 1 / 5, "d2": 2 / 5}, "q2": {"d0": 3 / 5, "d1": 4 / 5, "d2": 1}},
    )
    # all-equal scores -> 0 (ref ranking.py:56-58)
    assert Ranking.from_run(spark, {"q1": {"d0": 5, "d1": 5}}).normalize() == \
        Ranking.from_run(spark, {"q1": {"d0": 0, "d1": 0}})
    assert ranking_q.normalize().has_queries


def test_interpolate(spark, ranking, ranking_q):
    # r2 = same pairs, scores = row position in the reference's frame order,
    # which is (q_id desc, score desc) — ranking.py:116 sorts both descending
    r2 = Ranking.from_run(
        spark,
        {"q2": {"d2": 0, "d3": 1, "d1": 2, "d0": 3},
         "q1": {"d2": 4, "d1": 5, "d0": 6}},
    )
    r_int = ranking.interpolate(r2, 0.5)
    assert r_int != ranking
    assert r_int["q1"] == {"d2": 152.0, "d1": 3.5, "d0": 3.5}
    assert r_int["q2"] == {"d2": 300.0, "d3": 4.0, "d1": 3.5, "d0": 3.5}

    r3 = Ranking.from_run(spark, {"q1": {"d1": 1, "d2": 2}})
    assert r3.interpolate(r3, 0.5, normalize=True) == Ranking.from_run(
        spark, {"q1": {"d1": 0, "d2": 1}}
    )
    # missing scores are zero
    r4 = Ranking.from_run(spark, {"q1": {"d1": 1, "d2": 1}, "q2": {"d0": 1}})
    r5 = Ranking.from_run(spark, {"q1": {"d0": 1, "d1": 1}, "q3": {"d0": 1}})
    assert r4.interpolate(r5, 0.5) == Ranking.from_run(
        spark,
        {"q1": {"d0": 0.5, "d1": 1, "d2": 0.5}, "q2": {"d0": 0.5}, "q3": {"d0": 0.5}},
    )
    # interpolate == manual weighted fusion (ref test_ranking.py:188)
    assert r4.interpolate(r5, 0.5) == 0.5 * r4 + 0.5 * r5
    # query column propagates
    assert ranking_q.interpolate(ranking, 0.5).has_queries


def test_rr_scores(spark, ranking, ranking_q):
    got = ranking.rr_scores(k=1)
    want = {
        "q1": {"d0": 1 / 4, "d1": 1 / 3, "d2": 1 / 2},
        "q2": {"d0": 1 / 5, "d1": 1 / 4, "d2": 1 / 2, "d3": 1 / 3},
    }
    for q, docs in want.items():
        for d, s in docs.items():
            assert math.isclose(got[q][d], s, rel_tol=1e-6)
    assert ranking_q.rr_scores().has_queries


def test_duplicate_error(spark):
    df = spark.createDataFrame(
        [("q1", "d1", 1.0), ("q1", "d1", 2.0), ("q1", "d2", 1.0)],
        "q_id string, id string, score float",
    )
    with pytest.raises(ValueError):
        Ranking(df, validate=True)


def test_save_load(spark, ranking, tmp_path):
    ranking.name = "Dummy"
    target = str(tmp_path / "run.tsv")
    ranking.save(target)
    r2 = Ranking.from_file(spark, target)
    assert ranking == r2
    assert r2.name == "Dummy"


def test_to_ir_measures(ranking):
    cols = ranking.to_ir_measures().columns
    assert cols == ["query_id", "doc_id", "score"]

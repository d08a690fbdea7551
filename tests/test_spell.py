"""SymSpell deletion-key suggestion (operators/spell.py): key algebra,
edit-class coverage, collision-verify rejection, ranking."""

import pytest

from searchengine_spark.operators import spell as SP


def test_deletion_keys_algebra(spark):
    df = spark.createDataFrame([("sort",), ("aa",), ("x",)], "t string")
    from pyspark.sql import functions as F

    rows = {r["t"]: r["k"] for r in df.select(
        "t", SP.deletion_keys(F.col("t")).alias("k")).collect()}
    assert sorted(rows["sort"]) == sorted(["sort", "ort", "srt", "sot", "sor"])
    assert sorted(rows["aa"]) == sorted(["aa", "a"])  # dedup of equal dels
    assert sorted(rows["x"]) == sorted(["x", ""])


@pytest.fixture(scope="module")
def dict_df(spark):
    return spark.createDataFrame(
        [("sort", 40), ("sword", 30), ("merge", 25), ("window", 20),
         ("sore", 10), ("fort", 5)],
        "term string, n_docs long",
    )


def test_spell_suggest_edit_classes(dict_df):
    out = SP.spell_suggest(
        dict_df, ["sorrt", "mege", "windoww", "sort", "sotr", "quxx", "sord"]
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query"], []).append(r)
    # insertion in the query ('sorrt' = sort + r) -> deletion fixes it
    assert [r["suggestion"] for r in by_q["sorrt"]] == ["sort"]
    assert by_q["sorrt"][0]["distance"] == 1
    # deletion in the query ('mege' = merge - r) -> insertion fixes it
    assert [r["suggestion"] for r in by_q["mege"]] == ["merge"]
    # trailing insertion
    assert [r["suggestion"] for r in by_q["windoww"]] == ["window"]
    # exact dict word: distance-0 self plus distance-1 neighbors, ranked
    # by n_docs desc (sort 40 > sore 10 > fort 5)
    assert [(r["suggestion"], r["distance"], r["rank"]) for r in
            sorted(by_q["sort"], key=lambda r: r["rank"])] == [
        ("sort", 0, 1), ("sore", 1, 2), ("fort", 1, 3),
    ]
    # transposition is plain-Levenshtein 2: candidates collide on keys
    # ('sotr'/'sort' share 'sot','sor') but the verify rejects them
    assert "sotr" not in by_q
    # nothing within distance 1 at all
    assert "quxx" not in by_q
    # substitution + insertion neighbors of 'sord', n_docs-ranked:
    # sort (sub t, 40) > sword (insert w, 30) > sore (sub e, 10)
    assert [r["suggestion"] for r in
            sorted(by_q["sord"], key=lambda r: r["rank"])] == [
        "sort", "sword", "sore",
    ]


def test_spell_suggest_max_and_validation(dict_df):
    top1 = SP.spell_suggest(dict_df, ["sort"], max_suggestions=1).collect()
    assert [(r["suggestion"], r["rank"]) for r in top1] == [("sort", 1)]
    with pytest.raises(ValueError):
        SP.spell_suggest(dict_df, [])
    with pytest.raises(ValueError):
        SP.spell_suggest(dict_df, ["a", "a"])
    with pytest.raises(ValueError):
        SP.spell_suggest(dict_df, [""])


def test_spell_suggest_layout_independence(dict_df):
    a = SP.spell_suggest(dict_df, ["sorrt", "sord"]).collect()
    b = SP.spell_suggest(dict_df.repartition(5), ["sorrt", "sord"]).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(a) == key(b)

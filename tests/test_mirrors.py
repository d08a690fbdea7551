"""Mirror-host detection (operators/mirrors.py).

Hand-built fixture semantics: pair formation, the min-shared floor,
the boilerplate host-cap, within-host re-post collapsing, and the
exact integer containment arithmetic.
"""

from __future__ import annotations

from searchengine_spark.operators import mirrors as MIR


def _rows(df):
    return {
        (r.host_a, r.host_b): (r.n_shared, r.n_a, r.n_b, r.containment_e6)
        for r in df.collect()
    }


def test_mirror_pairs_basic(spark):
    docs = spark.createDataFrame(
        [
            # host A: 3 pages; B mirrors 2 of them; C shares only 1;
            # D is disjoint
            ("a.com", "t1"),
            ("a.com", "t2"),
            ("a.com", "t3"),
            ("b.com", "t1"),
            ("b.com", "t2"),
            ("b.com", "t9"),
            ("c.com", "t1"),
            ("d.com", "tx"),
        ],
        ["host", "text"],
    )
    got = _rows(MIR.mirror_pairs(docs))
    # only (a,b) clears min_shared=2; containment = 2e6 DIV min(3,3)
    assert got == {("a.com", "b.com"): (2, 3, 3, 666666)}


def test_mirror_full_containment_and_repost_collapse(spark):
    docs = spark.createDataFrame(
        [
            ("big.com", "p1"),
            ("big.com", "p2"),
            ("big.com", "p3"),
            ("big.com", "p4"),
            ("mini.com", "p1"),
            ("mini.com", "p2"),
            ("mini.com", "p2"),  # re-post inside one host: counts once
        ],
        ["host", "text"],
    )
    got = _rows(MIR.mirror_pairs(docs))
    # mini is a FULL mirror of a big.com subset: containment 1_000_000
    assert got == {("big.com", "mini.com"): (2, 4, 2, 1000000)}


def test_mirror_boilerplate_cap_drops_ubiquitous_pages(spark):
    # one boilerplate page served by 17 hosts (over the 16-host cap)
    # must contribute nothing; the two real shared pages still pair.
    rows = [(f"h{i:02d}.com", "boiler") for i in range(17)]
    rows += [
        ("h00.com", "realA"),
        ("h01.com", "realA"),
        ("h00.com", "realB"),
        ("h01.com", "realB"),
    ]
    docs = spark.createDataFrame(rows, ["host", "text"])
    got = _rows(MIR.mirror_pairs(docs))
    assert set(got) == {("h00.com", "h01.com")}
    n_shared, n_a, n_b, cont = got[("h00.com", "h01.com")]
    assert n_shared == 2 and n_a == 3 and n_b == 3  # sizes count boiler
    assert cont == 666666


def test_mirror_host_col_rename(spark):
    docs = spark.createDataFrame(
        [("s1", "x"), ("s2", "x"), ("s1", "y"), ("s2", "y")],
        ["source", "text"],
    )
    got = _rows(MIR.mirror_pairs(docs, host_col="source"))
    assert got == {("s1", "s2"): (2, 2, 2, 1000000)}

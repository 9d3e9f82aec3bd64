"""Property-based spot checks (SURVEY §5.4): Spark expressions vs a
pure-Python model of the reference's petl semantics, over randomized
inputs.

One Spark job per hypothesis example would be slow, so each property
@given-generates a LIST of inputs and evaluates them in one DataFrame
pass, comparing elementwise.  max_examples stays small — the row lists
inside each example carry the randomness.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from beacon_data_importer_spark.functions import expressions as E
from beacon_data_importer_spark.operators.dedup import first_wins
from beacon_data_importer_spark.operators.setops import union_by_name

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# text without NUL (Spark strings) and without surrogates
_txt = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=12,
)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000)), min_size=1, max_size=40
    )
)
def test_first_wins_one_row_per_key_minimal_order(spark, rows):
    """first_wins keeps exactly one row per key — the minimum under the
    explicit order — regardless of duplication pattern (petl
    dictlookupone parity, J1)."""
    df = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in rows], "k int, v int"
    )
    got = {
        (r.k, r.v)
        for r in first_wins(df, "k", [F.col("v"), F.col("k")]).collect()
    }
    expect = {}
    for k, v in rows:
        expect[k] = min(expect.get(k, v), v)
    assert got == set(expect.items())


@settings(**SETTINGS)
@given(
    st.lists(st.tuples(_txt, _txt), min_size=1, max_size=25),
    st.lists(st.tuples(_txt, _txt), min_size=1, max_size=25),
)
def test_union_by_name_conserves_rows_and_pads_nulls(spark, rows_a, rows_b):
    """etl.cat semantics (U1): bag union by column name — row counts add,
    duplicates survive, disjoint columns pad with NULL."""
    a = spark.createDataFrame([Row(x=x, y=y) for x, y in rows_a], "x string, y string")
    b = spark.createDataFrame([Row(y=y, z=z) for y, z in rows_b], "y string, z string")
    cat = union_by_name([a, b])
    out = cat.collect()
    assert len(out) == len(rows_a) + len(rows_b)
    assert set(cat.columns) == {"x", "y", "z"}
    assert sum(1 for r in out if r.z is None) == len(rows_a)
    assert sum(1 for r in out if r.x is None) == len(rows_b)


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.dates(dt.date(1990, 1, 1), dt.date(2030, 12, 31)).map(
                lambda d: d.strftime("%-d/%-m/%Y")
            ),
            _txt,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_parse_date_dmy_matches_python_strptime(spark, values):
    """X2 error-as-null: every cell parses like datetime.strptime
    '%d/%m/%Y' or becomes NULL — never an error row."""
    df = spark.createDataFrame([Row(s=s) for s in values], "s string")
    got = [r.d for r in df.select(E.parse_date_dmy("s").alias("d")).collect()]
    for s, g in zip(values, got):
        try:
            expect = dt.datetime.strptime(s, "%d/%m/%Y").date()
        except ValueError:
            expect = None
        assert g == expect, (s, g, expect)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.dates(dt.date(2019, 1, 1), dt.date(2022, 1, 1))),
            st.dates(dt.date(2019, 1, 1), dt.date(2022, 1, 1)),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_callback_start_date_fallback_arithmetic(spark, rows):
    """X15: callback date if present, else latest_attempt + 6 days —
    matches Python timedelta arithmetic exactly (calendar edges incl.)."""
    df = spark.createDataFrame(
        [Row(cb=cb, la=la) for cb, la in rows], "cb date, la date"
    )
    got = [
        r.s
        for r in df.select(E.callback_start_date("cb", "la").alias("s")).collect()
    ]
    for (cb, la), g in zip(rows, got):
        assert g == (cb if cb is not None else la + dt.timedelta(days=6))


# word-salad docs from a tiny vocabulary so cross-doc passage
# duplication actually occurs in generated corpora
_words = st.lists(
    st.sampled_from(["red", "blue", "fox", "dog", "run", "sky"]),
    min_size=1,
    max_size=30,
)


@settings(**SETTINGS)
@given(st.lists(_words, min_size=1, max_size=12))
def test_passage_dedup_properties(spark, docs):
    """Three ExactSubstr invariants on arbitrary corpora: (a) surviving
    FULL passages are globally unique; (b) a doc with zero removals
    round-trips to its normalized text; (c) kept+removed covers every
    window exactly once."""
    from beacon_data_importer_spark.operators.dedup import passage_dedup

    W = 4
    rows = [Row(id=i, t=" ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows)
    out = passage_dedup(df, "t", "id", window=W).collect()
    assert len(out) == len(docs)
    by_id = {r.id: r for r in out}
    seen_full = set()
    for i, ws in enumerate(docs):
        r = by_id[i]
        n_windows = (len(ws) + W - 1) // W
        assert r.kept_passages + r.removed_passages == n_windows
        if r.removed_passages == 0:
            assert r.clean_text == " ".join(ws)
        toks = r.clean_text.split() if r.clean_text else []
        for st_ in range(0, len(toks), W):
            p = " ".join(toks[st_ : st_ + W])
            if len(toks) - st_ >= W:
                assert p not in seen_full, "duplicate full passage survived"
                seen_full.add(p)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 50)),
        min_size=1,
        max_size=60,
    ),
    st.lists(
        st.tuples(st.integers(0, 6), st.text(max_size=6)),
        min_size=1,
        max_size=12,
    ),
    st.integers(1, 8),
)
def test_salted_join_is_salt_invariant(spark, left_rows, right_rows, salts):
    """salted_join == plain join for ANY salt count ≥ 1 (the salt must
    only reshape the exchange, never the result), including inputs that
    already carry a __salt column (collision-safe temp naming)."""
    from beacon_data_importer_spark.operators.skew import salted_join

    l = spark.createDataFrame(
        [Row(k=k, rid=i, __salt=i) for i, (k, _) in enumerate(left_rows)]
    )
    r = spark.createDataFrame(
        [Row(k=k, payload=p) for k, p in {k: p for k, p in right_rows}.items()]
    )
    got = sorted(
        (row.k, row.rid, row.payload)
        for row in salted_join(l, r, "k", "rid", salts=salts).collect()
    )
    want = sorted(
        (row.k, row.rid, row.payload) for row in l.join(r, "k").collect()
    )
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 100)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 100)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
)
def test_snapshot_diff_partitions_changes(spark, old_rows, new_rows):
    """snapshot_diff classifies exactly: inserts = new∖old keys,
    deletes = old∖new keys, updates = common keys with changed payload;
    unchanged rows never appear."""
    from beacon_data_importer_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame([Row(k=k, v=v) for k, v in old_rows])
    new = spark.createDataFrame([Row(k=k, v=v) for k, v in new_rows])
    got = {
        (r.k, r.change_type)
        for r in snapshot_diff(old, new, "k", ["v"]).collect()
    }
    do, dn = dict(old_rows), dict(new_rows)
    want = (
        {(k, "insert") for k in dn.keys() - do.keys()}
        | {(k, "delete") for k in do.keys() - dn.keys()}
        | {(k, "update") for k in do.keys() & dn.keys() if do[k] != dn[k]}
    )
    assert got == want

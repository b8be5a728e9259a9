"""Golden-value tests for the hash contracts (SURVEY §2.8: hashes must
be stable across engines/languages)."""

from openmetrics_spark.functions.hashing import xxhash64_str


def test_xxhash64_spec_vectors():
    # public xxHash spec vectors, seed 0
    assert xxhash64_str("") == 0xEF46DB3751D8E999
    assert xxhash64_str("a") == 0xD24EC4F1A98C6E5B
    assert xxhash64_str("abc") == 0x44BC2CF5AD770999


def test_xxhash64_long_input_covers_stripe_loop():
    s = "Hello, world! This is a longer string exceeding thirty-two bytes."
    assert xxhash64_str(s) == 0x12F05AB61065AD89  # pinned regression value


def test_portable_hash60_matches_duckdb():
    import duckdb

    v = duckdb.connect().execute(
        "SELECT CAST(('0x' || substr(md5('abc'), 1, 15)) AS BIGINT)"
    ).fetchone()[0]
    # spark-side value verified by the oracle parity suite; pin duckdb here
    assert v == 648541476951500027


def test_xxhash64_sql_matches_python_all_lengths():
    """The oracle-side SQL xxhash64 generator must agree with the
    Python implementation for every length 0..31 (its validity range)
    plus random ASCII strings."""
    import random
    import string

    import duckdb

    from openmetrics_spark.functions.hashing_sql import xxhash64_sql

    random.seed(7)
    tests = ["q%d" % i for i in range(10)]
    tests += ["x" * n for n in range(32)]
    tests += [
        "".join(random.choices(string.printable[:94], k=random.randint(0, 31)))
        for _ in range(100)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(__q VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in set(tests)])
    got = dict(
        con.sql(
            f"SELECT __q, __hash FROM {xxhash64_sql('SELECT __q FROM t')}"
        ).fetchall()
    )
    for t in set(tests):
        assert int(got[t]) == xxhash64_str(t), repr(t)


def test_query_hex_sql_matches_java_tohexstring():
    import duckdb

    from openmetrics_spark.functions.hashing_sql import query_hex_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t(__q VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [("q7",), ("hello",)])
    got = dict(
        con.sql(
            f"SELECT __q, query_hex FROM {query_hex_sql('SELECT __q FROM t')}"
        ).fetchall()
    )
    for s, hx in got.items():
        v = xxhash64_str(s)
        assert hx == format(v, "x")  # lowercase, no leading zeros

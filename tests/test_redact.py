"""PII redaction operator tests."""

import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.redact import (
    KINDS,
    pii_pattern,
    redact_pii,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@mail.example.org today"),
            (2, "server 192.168.0.1 answered"),
            (3, "ssn 123-45-6789 on file"),
            (4, "card 4111 1111 1111 1111 expires"),
            (5, "call +1 555-123-4567 now"),
            (6, "nothing sensitive here"),
            (7, None),
            (8, "two mails a@b.io and c@d.io plus 10.0.0.7"),
        ],
        "id long, text string",
    )


class TestRedactPII:
    def test_each_kind_redacts(self, spark, frame):
        out = {
            r["id"]: r["text"]
            for r in frame.transform(redact_pii()).collect()
        }
        assert out[1] == "mail me at [EMAIL] today"
        assert out[2] == "server [IP] answered"
        assert out[3] == "ssn [SSN] on file"
        assert out[4] == "card [CARD] expires"
        assert out[5] == "call [PHONE] now"
        assert out[6] == "nothing sensitive here"
        assert out[7] is None
        assert out[8] == "two mails [EMAIL] and [EMAIL] plus [IP]"

    def test_counts(self, spark, frame):
        out = {
            r["id"]: r["n_redactions"]
            for r in frame.transform(
                redact_pii(count_column="n_redactions")
            ).collect()
        }
        assert out[1] == 1 and out[6] == 0 and out[8] == 3
        assert out[7] is None

    def test_kind_subset_and_output_column(self, spark, frame):
        out = {
            r["id"]: r["clean"]
            for r in frame.transform(
                redact_pii(kinds=["email"], output_column="clean")
            ).collect()
        }
        # only emails touched; IPs left alone
        assert out[1] == "mail me at [EMAIL] today"
        assert out[2] == "server 192.168.0.1 answered"

    def test_specific_kinds_win_over_phone(self, spark):
        """SSN/card/IP shapes must not be half-eaten by the phone
        pattern — kind order is fixed most-specific-first."""
        df = spark.createDataFrame(
            [(1, "123-45-6789 and 4111-1111-1111-1111 and 10.0.0.1")],
            "id long, text string",
        )
        got = df.transform(redact_pii()).collect()[0]["text"]
        assert got == "[SSN] and [CARD] and [IP]"

    def test_validation(self):
        with pytest.raises(ValueError, match="unknown PII"):
            redact_pii(kinds=["email", "passport"])
        with pytest.raises(ValueError, match="unknown PII"):
            pii_pattern("nope")
        assert set(KINDS) == {"email", "ssn", "card", "ip", "phone"}

    def test_duckdb_regex_parity(self, spark, frame):
        """The exact patterns must behave identically in DuckDB (RE2) —
        the property the oracle of redact_pii_docs rests on."""
        import duckdb

        rows = [(r["id"], r["text"]) for r in frame.collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join(["(?, ?)"] * len(rows))
            + ") v(id, text)",
            [x for row in rows for x in row],
        )
        expr = "text"
        for k in KINDS:
            pat = pii_pattern(k).replace("'", "''")
            expr = (
                f"regexp_replace({expr}, '{pat}', "
                f"'[{k.upper()}]', 'g')"
            )
        duck = dict(
            con.execute(f"SELECT id, {expr} FROM t").fetchall()
        )
        got = {
            r["id"]: r["text"]
            for r in frame.transform(redact_pii()).collect()
        }
        assert got == duck

"""Cross-libm rounding-margin guarantee for text_unigram_logprob
(VERDICT r3 task #8).

The query's oracle contract rounds each token's ln((c+1)/(T+V)) to 9
decimals in BOTH engines (JVM Math.log vs DuckDB std::log).  Neither
libm is correctly rounded, so the contract would be a latent
data-dependent hash flake IF any ln value sat within ~1 ulp of a 9dp
rounding boundary.  This test replaces that hope with a checked margin:

  - the ln INPUT x=(c+1)/(T+V) is an IEEE double division of integers —
    correctly rounded, bit-identical everywhere, so both engines call
    their libm on the SAME double;
  - faithful libms differ from the true ln by < 1 ulp, so if the
    Python-computed ln is more than MARGIN = 3 ulps away from the
    nearest 0.5e-9 boundary, every faithful libm rounds it identically;
  - the second rounding layer (per-doc DECIMAL sum -> double cast ->
    /count -> 6dp) involves no libm at all: decimal aggregation is
    exact and IEEE casts/divisions are correctly rounded.

The distinct ln inputs are one per distinct train-count c (plus the OOV
c=0), a few hundred values per sf — checked exhaustively per run.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from debezium_nats_cdc_spark.operators.sampling import TRAIN_HEX_CUTOFF


def _distinct_counts(sf_dir: str) -> tuple[list[int], int, int]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rows = con.execute(f"""
        WITH tok AS (
          SELECT unnest(string_split(lower(coalesce(text, '')), ' ')) AS tok
          FROM documents
          WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{TRAIN_HEX_CUTOFF}'
        ),
        model AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok)
        SELECT DISTINCT c FROM model
    """).fetchall()
    t_total, v_size = con.execute("""
        WITH tok AS (
          SELECT unnest(string_split(lower(coalesce(text, '')), ' ')) AS tok
          FROM documents
          WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{}'
        ),
        model AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok)
        SELECT CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM model
    """.format(TRAIN_HEX_CUTOFF)).fetchone()
    return [r[0] for r in rows], t_total, v_size


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_ln_values_clear_of_9dp_rounding_boundaries(sf_dir):
    counts, t_total, v_size = _distinct_counts(sf_dir)
    denom = float(t_total + v_size)
    worst = None
    for c in counts + [0]:  # 0 => the OOV smoothing value
        x = (c + 1.0) / denom        # IEEE-exact same double both engines
        lp = math.log(x)
        ulp = math.ulp(lp)
        # distance to the nearest k + 0.5 tick of the 1e-9 grid
        scaled = lp * 1e9
        frac = scaled - math.floor(scaled)
        dist = abs(frac - 0.5) * 1e-9
        margin_ulps = dist / ulp
        if worst is None or margin_ulps < worst[0]:
            worst = (margin_ulps, c, lp)
        assert margin_ulps > 3.0, (
            f"ln value for count c={c} (lp={lp!r}) sits {margin_ulps:.2f} "
            f"ulps from a 9dp rounding boundary — faithful libms may "
            f"round it differently; re-derive the contract for this corpus"
        )
    # documented margin: report the tightest value for the round summary
    assert worst is not None

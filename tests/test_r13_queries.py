"""Round-13 registry additions: semantic invariants beyond the
oracle-parity gate (the gate proves engine==DuckDB; these pin the
properties that make each operator CORRECT, so a bug that breaks both
engines identically still turns red)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatanycdiseasesurveillance_spark.registry import all_specs

SPECS = all_specs()


def test_burstiness_invariants(spark, sf_dir):
    rows = SPECS["txt_burstiness_profile"].fn(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "de", "zh", "fr", "es"}
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["rank"])
        # ranks are contiguous from 1 and respect the total order
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["burst_ppm"], -r["cf"], r["term"]) for r in rs]
        assert keys == sorted(keys)
        for r in rs:
            # cf >= df always (every counted doc contributes >= 1), so
            # burstiness can never drop below 1.0 == 1e6 ppm; the df
            # floor is the registration constant
            assert r["burst_ppm"] >= 1_000_000
            assert r["df"] >= 5
            assert r["cf"] >= r["df"]
    # re-derive cf/df for the top-ranked en term with a direct filter —
    # independent of the profile's two-stage groupBy path
    top = by_lang["en"][0]
    tok = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("lang") == "en")
        .select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), " "), lambda t: t != ""
                )
            ).alias("t"),
        )
        .filter(F.col("t") == top["term"])
    )
    cf = tok.count()
    df = tok.select("doc_id").distinct().count()
    assert (cf, df) == (top["cf"], top["df"])
    assert top["burst_ppm"] == (1_000_000 * cf) // df


def test_srswor_invariants(spark, sf_dir):
    rows = SPECS["samp_srswor_profile"].fn(spark, sf_dir).collect()
    n_total = sum(r["n_docs"] for r in rows)
    n_sample = sum(r["n_sampled"] for r in rows)
    # fixed-SIZE contract: the realized sample is exactly min(budget, N)
    assert n_sample == min(5_000, n_total)
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_docs"]
    # shares are ppm quantizations of a partition of unity: each side
    # sums to 1e6 minus at most one floor-loss per stratum
    for col in ("expected_ppm", "realized_ppm"):
        s = sum(r[col] for r in rows)
        assert 1_000_000 - len(rows) <= s <= 1_000_000
    # membership is a pure function of the data: a rerun returns the
    # identical profile (rand()/sample() could not promise this)
    again = {
        r["source"]: r["n_sampled"]
        for r in SPECS["samp_srswor_profile"].fn(spark, sf_dir).collect()
    }
    assert again == {r["source"]: r["n_sampled"] for r in rows}


def test_dwell_quantile_invariants(spark, sf_dir):
    rows = SPECS["seq_dwell_time_quantiles"].fn(spark, sf_dir).collect()
    assert rows, "every event type with >= 2-event sessions emits a row"
    for r in rows:
        # order statistics of one distribution, second grain, and no
        # dwell can exceed the 12h session gap by construction
        assert 0 <= r["q1_s"] <= r["med_s"] <= r["q3_s"] <= r["max_s"]
        assert r["max_s"] <= 43_200
        assert r["n_dwells"] >= 1
    # every dwell pairs two consecutive same-session events, so the
    # total count is events minus one per session — re-derived with an
    # independent single-window sessionization
    from bigdatanycdiseasesurveillance_spark.tables import table

    ev = table(spark, sf_dir, "events")
    n_events = ev.count()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us")
    )
    n_sessions = gaps.filter(
        F.col("gap_us").isNull() | (F.col("gap_us") > 43_200_000_000)
    ).count()
    assert sum(r["n_dwells"] for r in rows) == n_events - n_sessions

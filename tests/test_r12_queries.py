"""Round-12 registry additions: semantic invariants beyond the
oracle-parity gate (the gate proves engine==DuckDB; these pin the
properties that make each operator CORRECT, so a bug that breaks both
engines identically still turns red)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdatanycdiseasesurveillance_spark.registry import all_specs

SPECS = all_specs()


def test_neyman_allocation_invariants(spark, sf_dir):
    rows = SPECS["samp_neyman_allocation"].fn(spark, sf_dir).collect()
    assert len(rows) == 20  # one row per source stratum
    # the largest-remainder contract: allocations sum EXACTLY to the
    # budget, and every stratum gets its floor share or floor + 1
    assert sum(r["alloc"] for r in rows) == 100_000
    assert all(r["alloc"] - r["alloc_base"] in (0, 1) for r in rows)
    # base shares are monotone in the quantized Neyman weight
    by_w = sorted(rows, key=lambda r: r["neyman_weight"])
    bases = [r["alloc_base"] for r in by_w]
    assert bases == sorted(bases)
    # weight re-derivation: wq == floor(sqrt(N*sum(v^2) - sum(v)^2)*1e6)
    # recomputed independently in Python for one stratum
    src = rows[0]["source"]
    vals = [
        r["n_chars"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("source") == src)
        .select("n_chars")
        .collect()
    ]
    n, s1, s2 = len(vals), sum(vals), sum(v * v for v in vals)
    expect = math.floor(math.sqrt(n * s2 - s1 * s1) * 1_000_000)
    assert rows[0]["neyman_weight"] == expect


def test_sentence_profile_invariants(spark, sf_dir):
    rows = SPECS["txt_sentence_segmentation_profile"].fn(spark, sf_dir).collect()
    langs = {r["lang"] for r in rows}
    assert langs == {"en", "de", "zh", "fr", "es"}
    for r in rows:
        # quartiles are order statistics of the same distribution
        assert 1 <= r["q1_words"] <= r["med_words"] <= r["q3_words"] <= r["max_words"]
        # the injector caps every non-final sentence at 10 words; the
        # final fragment is <= 10 words too, so nothing exceeds 10
        assert r["max_words"] <= 10
        assert r["n_sentences"] >= r["n_docs"] >= 1


def test_grouped_histogram_quantiles_exact():
    """The device's inverse-CDF positions vs a hand-sorted list."""
    from bigdatanycdiseasesurveillance_spark.session import get_spark
    from bigdatanycdiseasesurveillance_spark.operators.ranking import (
        grouped_histogram_quantiles,
    )

    spark = get_spark("bdnds-tests")
    data = [("g", v) for v in [5, 1, 3, 3, 9, 2, 8]] + [("h", 4)]
    df = spark.createDataFrame(data, "grp string, v long")
    out = {
        r["grp"]: r
        for r in grouped_histogram_quantiles(
            df, ["grp"], "v", {"q1": (1, 4), "med": (1, 2), "q3": (3, 4)}
        ).collect()
    }
    # g sorted: [1,2,3,3,5,8,9], n=7 -> pos ceil(7/4)=2, ceil(7/2)=4,
    # ceil(21/4)=6 -> values 2, 3, 8
    assert (out["g"]["q1"], out["g"]["med"], out["g"]["q3"]) == (2, 3, 8)
    assert out["g"]["n_values"] == 7 and out["g"]["max_value"] == 9
    # singleton group: every quantile is the single value
    assert (out["h"]["q1"], out["h"]["med"], out["h"]["q3"]) == (4, 4, 4)


def test_largest_remainder_allocation_exact():
    """Hand-checkable shares: proportional weights split exactly; a
    non-divisible split tops up the largest remainders, ties broken by
    the order column ascending."""
    from bigdatanycdiseasesurveillance_spark.operators.allocation import (
        largest_remainder_allocation,
    )
    from bigdatanycdiseasesurveillance_spark.session import get_spark

    spark = get_spark("bdnds-tests")
    exact = {
        r["k"]: r["alloc"]
        for r in largest_remainder_allocation(
            spark.createDataFrame(
                [("a", 5), ("b", 3), ("c", 2)], "k string, w long"
            ),
            "w",
            10,
            order_col="k",
        ).collect()
    }
    assert exact == {"a": 5, "b": 3, "c": 2}
    # equal weights, budget 10 over 3: bases are 3 each, remainders tie
    # -> the +1 goes to the lowest order key
    tie = {
        r["k"]: r["alloc"]
        for r in largest_remainder_allocation(
            spark.createDataFrame(
                [("a", 1), ("b", 1), ("c", 1)], "k string, w long"
            ),
            "w",
            10,
            order_col="k",
        ).collect()
    }
    assert tie == {"a": 4, "b": 3, "c": 3}
    assert sum(tie.values()) == 10


def test_systematic_sample_stride(spark, sf_dir):
    """At sf0.001 N=500 < budget -> stride clamps to 1 and the sample
    is exhaustive; the invariant that matters at every sf: the total
    selected equals ceil(N / k) with k = max(1, N div 2000)."""
    rows = SPECS["samp_systematic_interval"].fn(spark, sf_dir).collect()
    n = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    k = max(1, n // 2000)
    assert sum(r["n_sampled"] for r in rows) == (n + k - 1) // k


def test_paragraph_profile_invariants(spark, sf_dir):
    rows = SPECS["txt_paragraph_structure_profile"].fn(spark, sf_dir).collect()
    assert len(rows) == 20  # per source
    for r in rows:
        assert 1 <= r["q1_words"] <= r["med_words"] <= r["q3_words"] <= r["max_words"]
        # a paragraph is <= 4 sentences x <= 10 words
        assert r["max_words"] <= 40
        assert r["n_paragraphs"] >= 1


def test_dedup_aware_mixing_budget(spark, sf_dir):
    rows = SPECS["cur_dedup_aware_mixing"].fn(spark, sf_dir).collect()
    assert sum(r["token_budget"] for r in rows) == 1_000_000
    for r in rows:
        assert r["n_kept"] <= r["n_docs"]
        assert r["dedup_tokens"] <= r["raw_tokens"]


def test_poisson_pps_full_python_replication(spark, sf_dir):
    """Replicate the PPS design end-to-end in Python at sf0.001 (500
    docs): membership (deviate * T < k * size * 2^60), the capped set,
    and the exact HT numerator identity
    n_uncapped_sampled * T + k * sum(capped sampled sizes)."""
    import hashlib

    K, SCALE = 1_000, 1 << 60
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    T = sum(r["n_chars"] for r in rows)
    want: dict = {}
    for r in rows:
        dev = int(
            hashlib.md5(f"pps:{r['doc_id']}".encode()).hexdigest()[:15], 16
        )
        capped = K * r["n_chars"] >= T
        in_sample = dev * T < K * r["n_chars"] * SCALE
        w = want.setdefault(
            r["source"], {"n": 0, "s": 0, "cap": 0, "chars": 0, "ht": 0}
        )
        w["n"] += 1
        w["chars"] += r["n_chars"]
        if in_sample:
            w["s"] += 1
            if capped:
                w["cap"] += 1
                w["ht"] += K * r["n_chars"]
            else:
                w["ht"] += T
    got = {
        r["source"]: r
        for r in SPECS["samp_poisson_pps"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for src, w in want.items():
        g = got[src]
        assert (
            g["n_docs"],
            g["n_sampled"],
            g["n_capped"],
            g["sum_chars"],
            g["ht_chars_num"],
        ) == (w["n"], w["s"], w["cap"], w["chars"], w["ht"]), src


def test_readability_profile_identities(spark, sf_dir):
    rows = SPECS["txt_readability_profile"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        wps = r["n_words"] / r["n_sentences"]
        cpw = r["n_word_chars"] / r["n_words"]
        assert abs(r["words_per_sentence"] - wps) < 1e-3
        assert abs(r["chars_per_word"] - cpw) < 1e-3
        assert abs(r["ari"] - (4.71 * cpw + 0.5 * wps - 21.43)) < 1e-3
        # every sentence has >= 1 word; every word >= 1 char
        assert r["n_words"] >= r["n_sentences"]
        assert r["n_word_chars"] >= r["n_words"]


def test_allocation_drift_budgets(spark, sf_dir):
    rows = SPECS["dq_allocation_drift"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    assert sum(r["alloc_full"] for r in rows) == 100_000
    assert sum(r["alloc_half"] for r in rows) == 100_000
    for r in rows:
        assert r["abs_drift"] == abs(r["alloc_full"] - r["alloc_half"])


def test_balanced_halves_mass_balance(spark, sf_dir):
    """The alternating split's defining property: |mass_A - mass_B| <=
    the largest single document, and counts differ by at most 1."""
    rows = SPECS["samp_balanced_halves"].fn(spark, sf_dir).collect()
    n_a = sum(r["n_a"] for r in rows)
    n_b = sum(r["n_b"] for r in rows)
    assert abs(n_a - n_b) <= 1
    max_doc = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg({"n_chars": "max"})
        .collect()[0][0]
    )
    chars_a = sum(r["chars_a"] for r in rows)
    chars_b = sum(r["chars_b"] for r in rows)
    assert abs(chars_a - chars_b) <= max_doc


def test_vocab_growth_monotone(spark, sf_dir):
    """Heaps profile invariants: both cumulative series are
    non-decreasing in the decile, vocab <= tokens, and decile 10 equals
    the full corpus per language."""
    from pyspark.sql import functions as F

    rows = SPECS["txt_vocab_growth_profile"].fn(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r)
    assert len(per) == 5 and all(len(v) == 10 for v in per.values())
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = {
        r["lang"]: (r["v"], r["o"])
        for r in docs.select(
            "lang",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
            ).alias("t"),
        )
        .groupBy("lang")
        .agg(
            F.countDistinct("t").alias("v"), F.count("*").alias("o")
        )
        .collect()
    }
    for lang, rs in per.items():
        rs.sort(key=lambda r: r["decile"])
        for a, b in zip(rs, rs[1:]):
            assert a["vocab_cum"] <= b["vocab_cum"]
            assert a["tokens_cum"] <= b["tokens_cum"]
        assert all(r["vocab_cum"] <= r["tokens_cum"] for r in rs)
        assert (rs[-1]["vocab_cum"], rs[-1]["tokens_cum"]) == full[lang]


def test_temperature_allocation_flattens(spark, sf_dir):
    """Higher tau must flatten the mix: the max-alloc share is
    non-increasing and the min-alloc share non-decreasing in tau; each
    tau's allocations sum exactly to the budget."""
    rows = SPECS["cur_mix_temperature_allocation"].fn(spark, sf_dir).collect()
    by_tau = {}
    for r in rows:
        by_tau.setdefault(r["tau"], []).append(r["alloc"])
    assert set(by_tau) == {1, 2, 4}
    for tau, allocs in by_tau.items():
        assert len(allocs) == 20
        assert sum(allocs) == 100_000, tau
    assert max(by_tau[1]) >= max(by_tau[2]) >= max(by_tau[4])
    assert min(by_tau[1]) <= min(by_tau[2]) <= min(by_tau[4])


def test_error_bursts_full_python_replication(spark, sf_dir):
    """Replicate the gaps-and-islands pattern in Python at sf0.001:
    per-user error events, 12h-gap islands, >= 3-length burst profile."""
    from pyspark.sql import functions as F

    from bigdatanycdiseasesurveillance_spark.tables import table

    GAP = 43_200_000_000
    rows = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("user_id", F.unix_micros("ts").alias("tus"), "event_id")
        .collect()
    )
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append((r["tus"], r["event_id"]))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        runs, cur = [], 0
        prev = None
        for t, _ in evs:
            if prev is None or t - prev > GAP:
                if cur:
                    runs.append(cur)
                cur = 1
            else:
                cur += 1
            prev = t
        if cur:
            runs.append(cur)
        q = [n for n in runs if n >= 3]
        if q:
            want[u] = (len(q), max(q), sum(q))
    got = {
        r["user_id"]: (r["n_bursts"], r["max_burst_len"], r["total_burst_events"])
        for r in SPECS["seq_error_bursts"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_zipf_profile_invariants(spark, sf_dir):
    """Ranks dense 1..20 per language, counts non-increasing along the
    rank, cumulative share monotone and <= 1e6 ppm; the bucketed
    refinement must agree with a direct per-language Python top-20."""
    from collections import Counter

    from pyspark.sql import functions as F

    rows = SPECS["txt_zipf_profile"].fn(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r)
    assert set(per) == {"en", "de", "zh", "fr", "es"}
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", "text")
        .collect()
    )
    counts: dict = {}
    for d in docs:
        c = counts.setdefault(d["lang"], Counter())
        c.update(t for t in d["text"].lower().split(" ") if t)
    for lang, rs in per.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, 21))
        cnts = [r["cnt"] for r in rs]
        assert cnts == sorted(cnts, reverse=True)
        shares = [r["cum_share_ppm"] for r in rs]
        assert shares == sorted(shares) and shares[-1] <= 1_000_000
        # exact agreement with the direct top-20 (count desc, token asc)
        want = sorted(counts[lang].items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        assert [(r["token"], r["cnt"]) for r in rs] == want


def test_bootstrap_profile_replication(spark, sf_dir):
    """Replicate one replicate's weights in Python: thresholded
    Poisson(1) weights from md5('boot:<doc>:<rep>'), per-source sums."""
    import hashlib

    from bigdatanycdiseasesurveillance_spark.queries.sampling_design_q import (
        _BOOT_T,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    want: dict = {}
    rep = 3
    for r in rows:
        dev = int(
            hashlib.md5(f"boot:{r['doc_id']}:{rep}".encode()).hexdigest()[:15],
            16,
        )
        w = 4
        for i, t in enumerate(_BOOT_T):
            if dev < t:
                w = i
                break
        a = want.setdefault(r["source"], [0, 0])
        a[0] += w
        a[1] += w * r["n_chars"]
    got = {
        r["source"]: (r["n_eff"], r["chars_w"])
        for r in SPECS["samp_bootstrap_profile"].fn(spark, sf_dir).collect()
        if r["replicate"] == rep
    }
    assert got == {s: tuple(v) for s, v in want.items()}
    # and the weight distribution is Poisson(1)-ish: mean weight ~ 1
    total_w = sum(v[0] for v in want.values())
    assert abs(total_w / len(rows) - 1.0) < 0.15


def test_neyman_compare_dominance(spark, sf_dir):
    """The theorem the query exists to exhibit: total estimator
    variance under Neyman allocation <= under proportional allocation
    (largest-remainder integer rounding can only break dominance by a
    vanishing amount; assert with a 0.1% slack), both allocations sum
    to the budget."""
    rows = SPECS["samp_stratified_neyman_compare"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    assert sum(r["alloc_prop"] for r in rows) == 100_000
    assert sum(r["alloc_ney"] for r in rows) == 100_000
    v_prop = sum(r["v_contrib_prop"] for r in rows)
    v_ney = sum(r["v_contrib_ney"] for r in rows)
    assert v_ney <= v_prop * 1.001, (v_ney, v_prop)


def test_novelty_curve_invariants(spark, sf_dir):
    """new_grams <= occurrences per cell; per source the total new
    grams across deciles equals the source's distinct 3-gram count."""
    from pyspark.sql import functions as F

    from bigdatanycdiseasesurveillance_spark.operators.curation import (
        token_shingles,
    )

    rows = SPECS["txt_ngram_novelty_curve"].fn(spark, sf_dir).collect()
    per: dict = {}
    for r in rows:
        assert 0 <= r["new_grams"] <= r["occurrences"]
        assert 0.0 <= r["novelty_rate"] <= 1.0
        per[r["source"]] = per.get(r["source"], 0) + r["new_grams"]
    distinct = {
        r["source"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", F.explode(token_shingles(F.col("text"), n=3)).alias("g"))
        .groupBy("source")
        .agg(F.countDistinct("g").alias("n"))
        .collect()
    }
    assert per == distinct


def test_session_handoff_matrix_shape(spark, sf_dir):
    """Probabilities normalize per from-state; handoff count equals
    sessions minus users (each user contributes n_sessions - 1)."""
    from pyspark.sql import functions as F

    rows = SPECS["seq_session_handoff_matrix"].fn(spark, sf_dir).collect()
    by_from: dict = {}
    total = 0
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r["prob"])
        total += r["cnt"]
    for probs in by_from.values():
        assert abs(sum(probs) - 1.0) < 1e-4
    # recompute sessions - users independently
    GAP = 43_200_000_000
    from bigdatanycdiseasesurveillance_spark.tables import table

    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("tus"))
        .collect()
    )
    per_user: dict = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(r["tus"])
    n_sessions = 0
    for ts in per_user.values():
        ts.sort()
        n_sessions += 1 + sum(
            1 for a, b in zip(ts, ts[1:]) if b - a > GAP
        )
    assert total == n_sessions - len(per_user)


def test_bucketed_rank_null_bucket_fails_loudly(spark):
    """r11 advisor: a NULL bucket key must raise, not crash the sort or
    silently drop rows at the offsets join."""
    import pytest

    from bigdatanycdiseasesurveillance_spark.operators.ranking import (
        bucketed_global_rank,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id long, v int"
    )
    with pytest.raises(ValueError, match="bucket key is NULL"):
        bucketed_global_rank(df, F.col("v"), [F.asc("id")]).collect()


def test_pack_concat_chunks_rejects_non_numeric_id(spark):
    """r11 advisor: a string id under the default bucketing silently
    casts to NULL on non-ANSI configs — must fail loudly instead."""
    import pytest

    from bigdatanycdiseasesurveillance_spark.operators.packing import (
        pack_concat_chunks,
    )

    df = spark.createDataFrame(
        [("a", 5), ("b", 7)], "doc_id string, n_tokens long"
    )
    with pytest.raises(ValueError, match="integer id column"):
        pack_concat_chunks(df)


def test_capture_recapture_identities(spark, sf_dir):
    """Overlap bounds (n_both <= min(n_a, n_b)), Chapman estimate
    recomputed from the emitted integers, and the ~30% capture rates."""
    rows = SPECS["samp_capture_recapture"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    tot = sum(r["n_docs"] for r in rows)
    ta = sum(r["n_a"] for r in rows)
    for r in rows:
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        want = round(
            (r["n_a"] + 1) * (r["n_b"] + 1) / (r["n_both"] + 1) - 1, 4
        )
        assert abs(r["chapman_est"] - want) < 1e-9
    assert abs(ta / tot - 0.3) < 0.1  # capture rate ~30% corpus-wide

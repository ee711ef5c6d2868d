"""Pins for the registry's driver-sampling priority order.

The driver samples a PREFIX of the registry each round, so ordering is
a correctness-adjacent contract: a reworked oracle that fails to
re-promote keeps a stale green row authoritative (the r5 tier bug, one
level up). These tests pin the structural scheme that replaced the
hand-maintained _ROUND_NEW list: an oracle-SQL content hash per
certified green row (ORACLE_HASHES.json), compared at load time, plus
an explicit red-round derived from positive failure evidence (r8
advisor: inferring red from "sampled newer than green" pinned rows-only
passes in tier 0 forever).
"""

import json
import os

from bigdatanycdiseasesurveillance_spark.registry import (
    _REGISTRY,
    all_specs,
    certified_hashes,
    oracle_hash,
    ordering_key,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_red_row_outranks_contract_rework():
    """Sampled-but-red stays tier 0 even when its oracle also changed
    (the r6 advisor's ordering finding)."""
    green = {"ok_q": 3}
    red = {"red_q": 4}
    sample = {"ok_q": 3, "red_q": 4}
    cert = {"ok_q": "aaaa", "red_q": "bbbb"}
    # red_q's current hash differs from its snapshot AND it has a red row
    k_red = ordering_key("red_q", 5, green, red, sample, cert, "cccc")
    k_stale = ordering_key("new_q", 1, green, red, sample, cert, "dddd")
    assert k_red[0] == 0 and k_stale[0] == 1
    assert k_red < k_stale


def test_regression_demotes_to_tier_0():
    """A query green in r2 with an explicit failure row in r6 (newer
    than its latest green, contract unchanged) is a live regression —
    it must sort tier 0, not coast in the green tier on its old green
    row (the r7 advisor's ordering finding)."""
    green = {"regressed": 2, "fine": 6}
    red = {"regressed": 6}
    sample = {"regressed": 6, "fine": 6}
    cert = {"regressed": "h1", "fine": "h2"}
    k_reg = ordering_key("regressed", 50, green, red, sample, cert, "h1")
    k_fine = ordering_key("fine", 0, green, red, sample, cert, "h2")
    assert k_reg[0] == 0
    assert k_fine[0] == 3
    assert k_reg < k_fine


def test_regreened_after_red_is_green_tier():
    """Red in r4 then green again in r6: the latest row is green, so it
    belongs in the rotation tier, not tier 0."""
    k = ordering_key("q", 0, {"q": 6}, {"q": 4}, {"q": 6}, {"q": "h"}, "h")
    assert k[0] == 3 and k[1] == 6


def test_rows_only_pass_is_not_a_regression():
    """The r8 advisor scenario: a query green in r3 whose oracle was
    later REMOVED gets rows-only `no_oracle` passes from then on. Those
    rows carry no failure evidence, so the query must not be pinned in
    tier 0 — with its (sentinel) contract certified it rotates in the
    green tier on its old green round."""
    green = {"q": 3}
    red = {}  # no_oracle passes never enter red_round
    sample = {"q": 7}  # sampled more recently than its last hash-green
    cert = {"q": "h"}
    k = ordering_key("q", 0, green, red, sample, cert, "h")
    assert k[0] == 3 and k[1] == 3


def test_driver_timeout_counts_as_red():
    """_driver_coverage red derivation: an err that isn't the rows-only
    marker is positive failure evidence; a no_oracle pass is not."""
    import bigdatanycdiseasesurveillance_spark.registry as R

    rows = {
        "timed_out": {"hash_match": None, "err": "driver timeout after 600s"},
        "rows_only": {"hash_match": None, "err": "no_oracle", "spark_rows": 5},
        "mismatch": {"hash_match": False, "err": None},
        "green": {"hash_match": True, "err": None},
    }
    import json as _json
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        with open(os.path.join(td, "CORRECTNESS_r05.json"), "w") as fh:
            _json.dump(rows, fh)
        orig = R._repo_root
        R._repo_root = lambda: td
        try:
            green, red, sample = R._driver_coverage()
        finally:
            R._repo_root = orig
    assert green == {"green": 5}
    assert red == {"timed_out": 5, "mismatch": 5}
    assert sample == {n: 5 for n in rows}


def test_oracle_edit_self_promotes():
    """Changing an oracle's SQL moves a green query into the priority
    tier with no list maintenance."""
    green = {"q": 2}
    sample = {"q": 2}
    cert = {"q": oracle_hash("SELECT 1 AS a")}
    fresh = ordering_key("q", 0, green, {}, sample, cert, oracle_hash("SELECT 1 AS a"))
    reworked = ordering_key("q", 0, green, {}, sample, cert, oracle_hash("SELECT 2 AS a"))
    assert fresh[0] == 3
    assert reworked[0] == 1


def test_green_tier_rotates_oldest_first():
    """Within the green tier, an r1-certified query outranks an
    r6-certified one regardless of registration order."""
    green = {"old": 1, "new": 6}
    sample = {"old": 1, "new": 6}
    cert = {"old": "h1", "new": "h2"}
    k_old = ordering_key("old", 100, green, {}, sample, cert, "h1")
    k_new = ordering_key("new", 0, green, {}, sample, cert, "h2")
    assert k_old < k_new


def test_never_sampled_outranks_green():
    key_never = ordering_key("x", 9, {}, {}, {}, {"x": "h"}, "h")
    key_green = ordering_key("y", 0, {"y": 1}, {}, {"y": 1}, {"y": "h"}, "h")
    assert key_never[0] == 2 and key_green[0] == 3
    assert key_never < key_green


def test_snapshot_covers_certified_registry():
    """Every registered query is either fingerprinted in
    ORACLE_HASHES.json or sorts into a pre-green tier — no query can
    silently coast on a stale contract."""
    specs = all_specs()
    cert = certified_hashes()
    assert cert, "ORACLE_HASHES.json missing — run tools/refresh_oracle_hashes.py"
    names = list(specs)
    # every contract-stale entry (no fingerprint, or fingerprint differs)
    # must sort before every certified-fresh entry: the driver's prefix
    # sample reaches it first. (Tier-0 red rows may be in either set and
    # precede both.)
    stale_pos = [
        i for i, n in enumerate(names) if cert.get(n) != oracle_hash(specs[n].oracle)
    ]
    fresh_pos = [
        i for i, n in enumerate(names) if cert.get(n) == oracle_hash(specs[n].oracle)
    ]
    if stale_pos and fresh_pos:
        assert max(stale_pos) < max(fresh_pos)


def test_snapshot_file_is_sorted_and_complete_format():
    path = os.path.join(REPO, "ORACLE_HASHES.json")
    with open(path) as fh:
        snap = json.load(fh)
    assert list(snap) == sorted(snap)
    assert all(isinstance(v, str) and len(v) == 16 for v in snap.values())
    # no fingerprints for unregistered names
    all_specs()
    assert set(snap) <= set(_REGISTRY)

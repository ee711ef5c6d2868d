#!/usr/bin/env python3
"""Refresh ORACLE_HASHES.json — the contract fingerprints behind the
registry's structural staleness tier (registry.ordering_key tier 1).

For every query whose LATEST CORRECTNESS_r*.json row is a hash_match,
record the CURRENT oracle SQL's hash: that green row certified the
oracle as it stands in the tree right now, so the fingerprint is
authoritative until the SQL next changes. Queries whose latest row is
red (or never sampled) keep their previous snapshot entry (or none) —
they are already in a priority tier.

RUN AT THE START OF EACH BUILD ROUND, before any oracle edits: the
driver's end-of-round correctness pass ran against the committed tree,
so at round start tree == certified contract. An oracle edited later
in the round then hashes differently and self-promotes to tier 1 with
no hand-maintained list (replaces the old registry._ROUND_NEW tuple).

Usage: python tools/refresh_oracle_hashes.py [--force]

A late run (after an in-round oracle edit) would stamp never-certified
SQL as the certified fingerprint and silently defeat the staleness
tier, so the tool REFUSES when any query module looks newer than the
newest CORRECTNESS artifact — dirty in git, or file mtime past the
artifact's (r7 advisor finding). --force overrides after review.
"""

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigdatanycdiseasesurveillance_spark.registry import (  # noqa: E402
    all_specs,
    oracle_hash,
)

# where oracle SQL text lives — an edit anywhere here can change a
# contract fingerprint
_ORACLE_SOURCES = "bigdatanycdiseasesurveillance_spark/queries"


def _late_run_evidence() -> list[str]:
    """Reasons to believe oracles changed AFTER the last driver gate."""
    reasons = []
    arts = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not arts:
        return []  # round 1: nothing certified yet, nothing to protect
    newest_art = max(os.path.getmtime(p) for p in arts)
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain", "--", _ORACLE_SOURCES],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip()
        if out:
            reasons.append(f"uncommitted query-module changes:\n{out}")
    except Exception:  # noqa: BLE001 — git unavailable: fall back to mtimes
        pass
    src = glob.glob(os.path.join(REPO, _ORACLE_SOURCES, "*.py"))
    late = [p for p in src if os.path.getmtime(p) > newest_art]
    if late:
        reasons.append(
            "query modules newer than the latest CORRECTNESS artifact: "
            + ", ".join(sorted(os.path.basename(p) for p in late))
        )
    return reasons


def main() -> None:
    if "--force" not in sys.argv:
        evidence = _late_run_evidence()
        if evidence:
            print(
                "REFUSING to refresh: this looks like a LATE run — the "
                "fingerprints would certify oracle SQL the driver never "
                "gated. Run at round start, before oracle edits, or pass "
                "--force if you know these edits predate the last gate.\n- "
                + "\n- ".join(evidence)
            )
            sys.exit(2)
    snap_path = os.path.join(REPO, "ORACLE_HASHES.json")
    snapshot: dict[str, str] = {}
    if os.path.exists(snap_path):
        with open(snap_path) as fh:
            snapshot = json.load(fh)

    # latest hash_match round per name across all artifacts, plus the
    # latest SAMPLED round — a red row newer than the last green one
    # must not refresh the fingerprint.
    latest_green: dict[str, int] = {}
    latest_sample: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        with open(path) as fh:
            for name, row in json.load(fh).items():
                latest_sample[name] = max(latest_sample.get(name, 0), rnd)
                if row.get("hash_match"):
                    latest_green[name] = max(latest_green.get(name, 0), rnd)

    specs = all_specs()
    updated = 0
    for name, spec in specs.items():
        g = latest_green.get(name)
        if g is None or latest_sample.get(name, 0) > g:
            continue  # never green, or red more recently than green
        h = oracle_hash(spec.oracle)
        if snapshot.get(name) != h:
            snapshot[name] = h
            updated += 1

    # drop entries for queries no longer registered (renames/removals)
    stale = [n for n in snapshot if n not in specs]
    for n in stale:
        del snapshot[n]

    with open(snap_path, "w") as fh:
        json.dump(dict(sorted(snapshot.items())), fh, indent=1)
        fh.write("\n")
    print(
        f"ORACLE_HASHES.json: {len(snapshot)} certified fingerprints "
        f"({updated} refreshed, {len(stale)} dropped)"
    )


if __name__ == "__main__":
    main()

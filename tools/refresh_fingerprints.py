"""Refresh ``tools/query_fingerprints.json`` — the per-query
last-driver-verified source fingerprint that closes the sampler's
changed-code blind spot (VERDICT r5 #3).

Semantics: ``fingerprints[name]`` is the sha1 of the query's def-site
source + resolved oracle SQL AT THE TIME OF ITS LAST DRIVER
VERIFICATION. ``__spark_entry__._changed_fingerprints`` compares the
current fingerprint against it; a mismatch demotes the query from the
"passed" pool into the unverified tier so the next driver sample
re-proves it.

Run AT SESSION START, right after a new ``CORRECTNESS_r{N}.json``
arrives (HEAD is then the code the driver just verified):

    python tools/refresh_fingerprints.py            # update newly-verified names
    python tools/refresh_fingerprints.py --all      # stamp every name (init)
    python tools/refresh_fingerprints.py --add-only # MID-ROUND: stamp only
                                                    # newly-registered names

``--add-only`` is the safe mid-round mode: after the round-start run,
code edits move HEAD away from what the driver verified, so re-stamping
latest-correctness names would hide an edited query from the sampler's
re-prove tier. It touches nothing but registry names missing from the
file (registration-time stamping, VERDICT r6 #1).

Default mode updates only names with a row in the NEWEST correctness
file (they were just verified at ~HEAD) and adds missing entries for
names with any historical row. ``--all`` re-stamps everything —
appropriate only when every query is known verified at HEAD.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rdf_mapreduce_joins_spark.plans import ORACLES, QUERIES  # noqa: E402

PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "query_fingerprints.json")


def main() -> int:
    stamp_all = "--all" in sys.argv
    add_only = "--add-only" in sys.argv
    try:
        with open(PATH) as fh:
            recorded = json.load(fh)
    except (OSError, ValueError):
        recorded = {}
    latest_names: set[str] = set()
    files = sorted(glob.glob(os.path.join(os.path.dirname(PATH), "..", "CORRECTNESS_r*.json")))
    if files:
        with open(files[-1]) as fh:
            latest_names = set(json.load(fh))
    ever, _ = entrymod._driver_history()
    updated = added = dropped = 0
    out: dict[str, str] = {}
    for n, fn in QUERIES.items():
        fp = entrymod._source_fingerprint(fn, ORACLES.get(n))
        if (stamp_all or n in latest_names) and not (add_only and n in recorded):
            out[n] = fp
            updated += n in recorded
            added += n not in recorded
        elif n in recorded:
            out[n] = recorded[n]
        else:
            # Never fingerprinted (new registration, or a historical row
            # that predates the mechanism): stamp the CURRENT fingerprint.
            # Registration-time stamping (VERDICT r6 #1) makes the file a
            # superset of the registry at all times, so a CORRECTNESS file
            # landing after close can never orphan a name and open the
            # next round red. Harmless for never-verified names: they are
            # tier-2 via driver history regardless of fingerprint, and
            # when their first driver row arrives the stamped fingerprint
            # already equals the code the driver ran (close HEAD).
            out[n] = fp
            added += 1
    _ = ever  # history retained for future modes; coverage no longer keys on it
    dropped = len([n for n in recorded if n not in QUERIES])
    with open(PATH, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"{len(out)} fingerprints ({updated} updated, {added} added, {dropped} dropped)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Regenerate tools/witness_hashes.json — the implementation hash each
registry query had at its last driver witness (see __spark_entry__
`_stale_impl_names`).

Protocol: run with no args AFTER a driver round goes green to stamp
every query's current hash; run with query names as args to stamp only
those (leaving a deliberately-stale entry is how a rewritten query is
forced back into the driver's 50-query window — do NOT stamp a query
you rewrote until the driver has re-witnessed it green).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "witness_hashes.json")
try:
    with open(path) as f:
        recorded = json.load(f)
except (OSError, ValueError):
    recorded = {}

names = sys.argv[1:] or list(entry.REGISTRY)
unknown = [n for n in names if n not in entry.REGISTRY]
if unknown:
    sys.exit(f"unknown query name(s): {unknown} — check the registry "
             "(rocketmq_flink_spark.plans.catalog.REGISTRY); nothing stamped")
for name in names:
    recorded[name] = entry._impl_hash(name)
recorded = {n: h for n, h in sorted(recorded.items()) if n in entry.REGISTRY}

with open(path, "w") as f:
    json.dump(recorded, f, indent=1, sort_keys=True)
    f.write("\n")
print(f"stamped {len(names)} of {len(recorded)} entries -> {path}")

"""Mechanical oldest-evidence-first driver-window rotation.

The driver's correctness gate hashes only the FIRST ``WINDOW`` keys of
``queries()`` each round, and the registry is frozen at ~243 keys, so
evidence goes stale in ~5 rounds unless the window rotates. Hand-picked
windows (rounds 1-5) don't scale to steady state; this tool derives the
window mechanically so every key is re-confirmed on a ~5-round cadence
(judge directive r5 #5):

1. Parse every ``CORRECTNESS_r*.json`` at the repo root; a key's
   evidence age is the LATEST round in which the driver recorded it.
2. The window is ``_FORCE_REFRESH`` (keys whose output changed this
   round — their old evidence no longer describes current code, so
   they must lead regardless of age) followed by every other key
   ordered oldest-evidence-first (ties broken by name, so the order is
   fully deterministic and reviewable).

``python scripts/evidence_rotation.py`` prints the derived window as a
ready-to-paste ``_PRIORITY`` tuple plus an age audit.
``tests/test_tools.py`` asserts the committed ``_PRIORITY`` equals
``derive_window()`` — the committed list cannot silently drift from
the mechanical rule.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def evidence_ages(repo: str = REPO) -> dict[str, int]:
    """name -> latest round with driver evidence (0 = never checked)."""
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        # CORRECTNESS_r05.json / CORRECTNESS_r12.json -> 5 / 12
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        with open(f) as fh:
            for k in json.load(fh):
                latest[k] = max(latest.get(k, 0), rnd)
    return latest


def derive_window(
    names, force: tuple[str, ...], window: int = WINDOW, repo: str = REPO
) -> tuple[str, ...]:
    """The mechanical window: forced keys first, then oldest-first."""
    ages = evidence_ages(repo)
    rest = [n for n in names if n not in force]
    rest.sort(key=lambda n: (ages.get(n, 0), n))
    out = [n for n in force if n in names] + rest
    return tuple(out[:window])


def main() -> int:
    from data_ingestor_spark.plans.queries import _FORCE_REFRESH, _PRIORITY, REGISTRY

    ages = evidence_ages()
    derived = derive_window(sorted(REGISTRY), _FORCE_REFRESH)
    print("# derived window (forced first, then oldest-evidence-first):")
    print("_PRIORITY: tuple[str, ...] = (")
    for n in derived:
        tag = "forced" if n in _FORCE_REFRESH else f"r{ages.get(n, 0)}"
        print(f'    "{n}",  # {tag}')
    print(")")
    never = [n for n in REGISTRY if ages.get(n, 0) == 0]
    stale = {}
    for n in REGISTRY:
        stale.setdefault(ages.get(n, 0), []).append(n)
    print(f"\n# registry: {len(REGISTRY)} keys; never-checked: {len(never)}")
    for rnd in sorted(stale):
        print(f"#   evidence r{rnd}: {len(stale[rnd])} keys")
    match = tuple(_PRIORITY) == derived
    print(f"# committed _PRIORITY matches derived: {match}")
    return 0 if match else 1


if __name__ == "__main__":
    sys.exit(main())

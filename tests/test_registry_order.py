"""Registry-order contract: the driver hash-checks the first 50 queries()
entries per round, so ordering is part of the correctness-verification
surface.

Policy (VERDICT r4 ask #3; artifact-enforced since r6 per VERDICT r5 ask
#8): rotate by witness age.  The window must hold the 50
least-recently-GREEN-witnessed entries, where an entry's witness age is
the newest round whose CORRECTNESS_r0N.json shows it green — hash_match
true, or (rows-only-by-design entries) err == "no_oracle" with
spark_rows recorded.  Never-green entries have age 0 and always lead.
This test recomputes ages from the artifacts in the repo root, so the
rotation policy cannot drift silently.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from __spark_entry__ import witness_ages

DRIVER_WINDOW = 50


def test_order_is_recomputable_from_artifacts():
    """WITNESS_ORDER must equal a fresh recompute — it is derived at
    import, so this only fails if someone reintroduces a hard-coded
    list or the compute function loses determinism."""
    assert entry_mod.WITNESS_ORDER == entry_mod.compute_witness_order()


def test_witness_order_is_exact_registry_permutation():
    order = entry_mod.WITNESS_ORDER
    reg = list(entry_mod.queries())
    assert len(order) == len(set(order)), "duplicate names in WITNESS_ORDER"
    assert set(order) == set(reg), (
        f"WITNESS_ORDER out of sync with registry: "
        f"missing={set(reg) - set(order)} stale={set(order) - set(reg)}"
    )
    assert reg == order, "queries() must iterate in WITNESS_ORDER"


def test_window_holds_least_recently_witnessed():
    """No entry outside the window may be strictly staler than one inside.

    Equal ages straddling the boundary are fine (ties broken
    alphabetically by convention, but the driver only cares about the
    set), so the assertion is on the age partition, not the exact order.
    """
    ages = witness_ages()
    reg = list(entry_mod.queries())
    inside, outside = reg[:DRIVER_WINDOW], reg[DRIVER_WINDOW:]
    max_inside = max(ages.get(n, 0) for n in inside)
    min_outside = min(ages.get(n, 0) for n in outside)
    stale_out = [n for n in outside if ages.get(n, 0) < max_inside]
    fresh_in = [n for n in inside if ages.get(n, 0) > min_outside]
    assert min_outside >= max_inside, (
        f"witness rotation drifted: entries outside the window are staler "
        f"than entries inside it — staler-outside={stale_out[:10]} "
        f"fresher-inside={fresh_in[:10]}"
    )


def test_never_witnessed_entries_lead():
    """Entries with no green driver row ever must all sit in the window
    (as long as they fit) — a new operator is not done until witnessed."""
    ages = witness_ages()
    reg = list(entry_mod.queries())
    never = [n for n in reg if ages.get(n, 0) == 0]
    if len(never) <= DRIVER_WINDOW:
        window = set(reg[:DRIVER_WINDOW])
        assert set(never) <= window, set(never) - window


def test_window_rows_only_entries_are_by_design():
    """Inside the window, only the two rows-only-by-design entries
    (multimodal_meta: binary decode has no SQL twin; sketch_profile:
    engine sketches hash-checked via sketch_exact) may lack an oracle."""
    window = list(entry_mod.queries())[:DRIVER_WINDOW]
    oracles = entry_mod.oracle_sql()
    rows_only = {n for n in window if n not in oracles}
    assert rows_only <= {"multimodal_meta", "sketch_profile"}, rows_only

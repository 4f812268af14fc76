"""Native C++ host-kernel parity tests: the ctypes inventory-space reduction
must agree with the pure-NumPy implementation on randomized configurations."""
import numpy as np
import pytest

from storage_tpu.exceptions import InventoryConstraintsCannotBeFulfilledError
from storage_tpu.native import inventory_space_native, native_available
from storage_tpu.ops.inventory_space import calculate_inventory_space
from storage_tpu.ops.ratchets import INTERP_LINEAR, INTERP_STEP

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no g++?)"
)


def random_config(rng, interp_kind, n=40):
    max_cap = rng.uniform(500, 5000)
    tables = []
    for _ in range(n):
        num_pillars = rng.integers(2, 6)
        inv = np.sort(rng.uniform(0, max_cap, num_pillars))
        inv[0], inv[-1] = 0.0, max_cap
        wdr = -np.sort(rng.uniform(5, 120, num_pillars))[::-1]
        inj = np.sort(rng.uniform(5, 120, num_pillars))[::-1]
        if interp_kind == INTERP_STEP:
            wdr = np.minimum.accumulate(wdr)  # withdrawal rate grows with inventory
            inj = np.minimum.accumulate(inj)
            wdr[-1] = wdr[-2]
            inj[-1] = inj[-2]
        tables.append(np.column_stack([inv, wdr, inj]))
    min_inv = np.zeros(n + 1)
    max_inv = np.full(n + 1, max_cap)
    loss = rng.uniform(0.0, 0.002, n)
    start = rng.uniform(0, max_cap)
    return tables, min_inv, max_inv, loss, start


@pytest.mark.parametrize("interp_kind", [INTERP_LINEAR, INTERP_STEP])
@pytest.mark.parametrize("must_be_empty", [False, True])
def test_native_matches_numpy(interp_kind, must_be_empty):
    rng = np.random.default_rng(123)
    checked = 0
    for trial in range(30):
        tables, min_inv, max_inv, loss, start = random_config(rng, interp_kind)
        try:
            py = calculate_inventory_space(
                tables, interp_kind, min_inv, max_inv, loss, start, must_be_empty,
                use_native=False,
            )
            py_raises = False
        except InventoryConstraintsCannotBeFulfilledError:
            py_raises = True
        if py_raises:
            with pytest.raises(InventoryConstraintsCannotBeFulfilledError):
                inventory_space_native(
                    tables, interp_kind, min_inv, max_inv, loss, start, must_be_empty
                )
            continue
        native = inventory_space_native(
            tables, interp_kind, min_inv, max_inv, loss, start, must_be_empty
        )
        assert native is not None
        np.testing.assert_allclose(native[0], py.min_inventory, rtol=1e-12, atol=1e-9)
        np.testing.assert_allclose(native[1], py.max_inventory, rtol=1e-12, atol=1e-9)
        checked += 1
    assert checked >= 10  # most random configs should be feasible


def test_dispatch_uses_native_by_default():
    rng = np.random.default_rng(7)
    tables, min_inv, max_inv, loss, start = random_config(rng, INTERP_LINEAR)
    a = calculate_inventory_space(
        tables, INTERP_LINEAR, min_inv, max_inv, loss, start, False, use_native=True
    )
    b = calculate_inventory_space(
        tables, INTERP_LINEAR, min_inv, max_inv, loss, start, False, use_native=False
    )
    np.testing.assert_allclose(a.min_inventory, b.min_inventory, atol=1e-9)
    np.testing.assert_allclose(a.max_inventory, b.max_inventory, atol=1e-9)

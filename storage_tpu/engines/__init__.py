"""Valuation engines: intrinsic, LSMC, trinomial tree."""

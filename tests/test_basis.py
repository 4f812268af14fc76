"""Basis-DSL parser tests (mirrors ``Lsmc/BasisFunctionsBuilderTest.cs`` intent)."""
import numpy as np
import pytest

from storage_tpu.utils.basis import (
    THREE_FACTOR_SEASONAL_ALIASES,
    Monomial,
    all_markov_powers_up_to,
    parse_basis_functions,
)
from storage_tpu.ops.regression import basis_spec, design_matrix


def test_parse_readme_expression():
    expr = "1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st"
    monos = parse_basis_functions(expr, THREE_FACTOR_SEASONAL_ALIASES)
    assert len(monos) == 10
    assert monos[0] == Monomial()
    assert monos[1] == Monomial(factor_powers=((0, 1),))
    assert monos[5] == Monomial(factor_powers=((0, 2),))
    assert monos[8] == Monomial(spot_power=2)
    assert monos[9] == Monomial(spot_power=1, factor_powers=((0, 1),))


def test_parse_xn_and_products():
    monos = parse_basis_functions("1 + x0 + x0**2 + x1 + x1*x1")
    assert monos[2] == Monomial(factor_powers=((0, 2),))
    assert monos[4] == Monomial(factor_powers=((1, 2),))  # x1*x1 == x1**2


def test_parse_cross_products_accumulate():
    (m,) = parse_basis_functions("s**2 * x0 * x1**3 * x0")
    assert m == Monomial(spot_power=2, factor_powers=((0, 2), (1, 3)))


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_basis_functions("")
    with pytest.raises(ValueError):
        parse_basis_functions("1 + + s")
    with pytest.raises(ValueError):
        parse_basis_functions("1 + y")
    with pytest.raises(ValueError):
        parse_basis_functions("s**x")


def test_design_matrix_values():
    monos = parse_basis_functions("1 + s + x0**2 + s*x1")
    spec = basis_spec(monos, num_factors=2)
    spot = np.array([2.0, 3.0])
    factors = np.array([[1.0, -1.0], [0.5, 2.0]])
    X = np.asarray(design_matrix(spec, spot, factors))
    np.testing.assert_allclose(
        X,
        [
            [1.0, 2.0, 1.0, 1.0],
            [1.0, 3.0, 1.0, 6.0],
        ],
    )


def test_basis_spec_factor_out_of_range():
    monos = parse_basis_functions("1 + x5")
    with pytest.raises(ValueError):
        basis_spec(monos, num_factors=2)


def test_all_markov_powers_up_to():
    basis = all_markov_powers_up_to(2, 2)
    assert len(basis) == 5

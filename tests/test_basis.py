"""Basis-DSL parser tests (mirrors ``Lsmc/BasisFunctionsBuilderTest.cs`` intent)."""
import numpy as np
import pytest

from storage_tpu.utils.basis import (
    S,
    THREE_FACTOR_SEASONAL_ALIASES,
    Monomial,
    X,
    all_markov_powers_up_to,
    as_monomials,
    markov_factor_power,
    ones,
    parse_basis_functions,
    spot_price_power,
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


class TestOperatorCombination:
    """Reference ``PowerMonomialBuilder.cs:30-76`` / ``Sim.cs:30-45`` parity:
    programmatic ``+``/``*``/``**`` composition equals the parsed DSL."""

    def test_mul_adds_powers(self):
        assert S * X(0) == Monomial(spot_power=1, factor_powers=((0, 1),))
        assert X(1) * X(1) == markov_factor_power(1, 2)
        assert (S * X(0) ** 2) * (S * X(1)) == Monomial(
            spot_power=2, factor_powers=((0, 2), (1, 1))
        )

    def test_pow_scales_powers(self):
        assert S ** 3 == spot_price_power(3)
        assert (S * X(0)) ** 2 == Monomial(spot_power=2, factor_powers=((0, 2),))
        assert (S * X(0)).pow(2) == (S * X(0)) ** 2
        with pytest.raises(ValueError):
            S ** -1

    def test_add_builds_basis_list(self):
        basis = ones() + S + X(0) + X(0) ** 2 + S * X(0)
        assert basis == parse_basis_functions("1 + s + x0 + x0**2 + s*x0")

    def test_add_with_existing_list(self):
        basis = [ones(), S] + X(0)
        assert basis == parse_basis_functions("1 + s + x0")
        basis2 = ones() + [S, X(0)]
        assert basis2 == parse_basis_functions("1 + s + x0")

    def test_composed_equals_parsed_readme_expression(self):
        expr = "1 + s + x_st + x_st**2 + s*x_st"
        composed = ones() + S + X(0) + X(0) ** 2 + S * X(0)
        assert as_monomials(composed) == parse_basis_functions(
            expr, THREE_FACTOR_SEASONAL_ALIASES
        )

    def test_as_monomials_accepts_string_single_and_list(self):
        assert as_monomials("1 + s") == [ones(), S]
        assert as_monomials(S) == [S]
        with pytest.raises(ValueError):
            as_monomials([])
        with pytest.raises(TypeError):
            as_monomials([S, "s"])

    def test_mul_with_non_monomial_rejected(self):
        with pytest.raises(TypeError):
            S * 2
        with pytest.raises(TypeError):
            S ** 1.5

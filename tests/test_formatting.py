"""Formatting-contract parity tests.

Oracles pinned from /root/reference/tests/unittest/utils_unit.cpp:9-96 and
the sentinel conventions in stats_test.cpp.
"""

import numpy as np
import pytest

from stoat_tpu.formatting import (
    is_pvalue_significant,
    pair_to_string,
    set_precision,
    string_to_pair,
    string_to_pvalue,
    string_to_vector,
    vector_to_string,
)
from stoat_tpu.corrections import adjust_pvalues_bh, adjusted_holm


@pytest.mark.parametrize(
    "value,expected",
    [
        (0.00001234, "1.2340e-05"),
        (0.123456, "0.1235"),
        (0.00001234567890123456789, "1.2346e-05"),
        (0.34567890123456789, "0.3457"),
        (0.333333333, "0.3333"),
        (1.0, "1"),
        (1.000000000, "1"),
        # sentinels / extremes used by the stats engine
        (0.0, "0"),
        (1.7976931348623157e308, "1.798e+308"),   # DBL_MAX (stats_test.cpp:197)
        (0.1573, "0.1573"),
        (0.8857, "0.8857"),
        (9.8233e-03, "9.8233e-03"),
        (-0.2707, "-0.2707"),
        (-0.363, "-0.363"),
        (7.4217e-02, "7.4217e-02"),
        (0.1, "0.1"),
        (247411.0, "2.474e+05"),
    ],
)
def test_set_precision(value, expected):
    assert set_precision(value) == expected


def test_string_to_pvalue():
    assert string_to_pvalue("0.01") == 0.01
    assert string_to_pvalue("NA") == 1.0
    assert string_to_pvalue("") == 1.0


def test_is_pvalue_significant():
    assert is_pvalue_significant(0.05, "0.01") is True
    assert is_pvalue_significant(0.05, "0.05") is False
    assert is_pvalue_significant(0.05, "NA") is False


def test_vector_string_roundtrip():
    assert vector_to_string(["A", "B", "C"]) == "A,B,C"
    assert vector_to_string([1, 2, 3]) == "1,2,3"
    assert string_to_vector("4,578,6") == [4, 578, 6]
    with pytest.raises(RuntimeError):
        string_to_vector("4,abc,6")


def test_pair_string_roundtrip():
    assert pair_to_string((4271, 4260)) == "4271_4260"
    assert string_to_pair("4271_4260") == (4271, 4260)


def test_adjusted_holm_monotone_and_bounded():
    adj = adjusted_holm(np.array([0.01, 0.03, 0.02, 0.05]))
    assert adj.shape == (4,)
    assert np.all(adj <= 1.0) and np.all(adj >= 0.0)
    # Equal inputs stay monotone after reordering
    adj2 = adjusted_holm(np.array([0.01, 0.01, 0.01, 0.01]))
    assert np.all(np.diff(adj2) >= 0)


def test_adjusted_holm_values():
    # Hand-worked against the reference loop (utils.cpp:61-87)
    raw = np.array([0.01, 0.03, 0.02, 0.05])
    adj = adjusted_holm(raw)
    np.testing.assert_allclose(adj, [0.04, 0.06, 0.06, 0.06])


def test_bh_oracle():
    # tests/unittest/post_processing_unit.cpp:12-46
    p = np.array([0.01, 0.04, 0.03, 0.002, 0.05])
    adj = adjust_pvalues_bh(p)
    np.testing.assert_allclose(adj, [0.025, 0.05, 0.05, 0.01, 0.05])


def test_bh_clamps_and_empty():
    adj = adjust_pvalues_bh(np.array([0.9, 0.95, 0.99]))
    assert np.all(adj <= 1.0)
    assert adjust_pvalues_bh(np.array([])).size == 0

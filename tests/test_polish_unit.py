"""Ports of polish.rs tests (polish.rs:303-319) + workflow validation."""

import pytest

from polypolish_tpu.errors import PolypolishError
from polypolish_tpu.pipeline.polish import check_option_values, fmt_f64
from polypolish_tpu.stats import qscore


def test_qscore():
    assert qscore(90.0000) == "Q10.00"
    assert qscore(99.0000) == "Q20.00"
    assert qscore(99.9000) == "Q30.00"
    assert qscore(99.9900) == "Q40.00"
    assert qscore(99.9990) == "Q50.00"
    assert qscore(99.9999) == "Q60.00"
    assert qscore(99.47634534) == "Q22.81"
    assert qscore(100.0) == "Q∞"
    assert qscore(0.0) == "Q0"


def test_check_option_values():
    check_option_values(0.2, 0.5)
    with pytest.raises(PolypolishError, match="fraction_valid"):
        check_option_values(0.2, 1.0)
    with pytest.raises(PolypolishError, match="fraction_valid"):
        check_option_values(0.2, 0.0)
    with pytest.raises(PolypolishError, match="fraction_invalid must be between"):
        check_option_values(0.0, 0.5)
    with pytest.raises(PolypolishError, match="fraction_invalid must be less"):
        check_option_values(0.5, 0.5)
    with pytest.raises(PolypolishError, match="fraction_invalid must be less"):
        check_option_values(0.6, 0.5)


def test_fmt_f64():
    assert fmt_f64(0.2) == "0.2"
    assert fmt_f64(0.5) == "0.5"
    assert fmt_f64(1.0) == "1"
    assert fmt_f64(99.9) == "99.9"
    assert fmt_f64(0.25) == "0.25"

"""Pin normalize()'s stringification contract (round-13).

normalize() moved from a per-row ``iterrows`` loop to ``to_numpy()`` rows
(~12x faster on million-row parity frames — the degenerate-fixture q47
grid spent 140 s of its 176 s test in normalize). These pins are the
byte-level contract both implementations satisfy, including the two
coercion corners that differ between naive row iterators:

* mixed int/float frames promote ints to float (so ``1`` prints ``1.0``)
  — the historical iterrows behavior, preserved by to_numpy;
* single-dtype datetime frames stringify as ``pd.Timestamp`` (space
  separator, no trailing zeros), NOT ``np.datetime64`` ISO form.
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_correctness import normalize  # noqa: E402


def test_null_and_nan_map_to_NULL():
    df = pd.DataFrame({"a": [None, float("nan"), 1.5]})
    assert normalize(df, ["a"]) == ["1.5", "NULL", "NULL"]


def test_float_uses_shortest_roundtrip_repr():
    df = pd.DataFrame({"a": [0.1, 1e-7, 123456789.123456]})
    assert normalize(df, ["a"]) == sorted(
        [repr(0.1), repr(1e-7), repr(123456789.123456)]
    )


def test_mixed_int_float_frame_promotes_ints():
    # historical iterrows coercion: the row vector takes the common dtype,
    # so ints in a mixed numeric frame stringify as floats on BOTH engines
    df = pd.DataFrame({"a": [1, 2], "b": [1.5, 2.5]})
    assert normalize(df, ["a", "b"]) == ["1.0|1.5", "2.0|2.5"]


def test_int_only_frame_stays_integer():
    df = pd.DataFrame({"a": [1, 2], "b": [3, 4]})
    assert normalize(df, ["a", "b"]) == ["1|3", "2|4"]


def test_pure_datetime_frame_prints_timestamps_not_datetime64():
    df = pd.DataFrame(
        {
            "t": pd.to_datetime(
                ["2024-01-15 10:30:00.123456", "2024-02-01 00:00:00.000000"],
                format="%Y-%m-%d %H:%M:%S.%f",
            )
        }
    )
    out = normalize(df, ["t"])
    assert out == ["2024-01-15 10:30:00.123456", "2024-02-01 00:00:00"]


def test_datetime_nat_prints_NaT():
    df = pd.DataFrame({"t": pd.to_datetime([pd.NaT, "2024-02-01 00:00:00"])})
    assert normalize(df, ["t"]) == ["2024-02-01 00:00:00", "NaT"]


def test_arrays_and_ndarrays_print_as_python_lists():
    df = pd.DataFrame({"a": [np.array([1, 2]), [3.5, 4.5], (5, 6)]})
    out = normalize(df, ["a"])
    assert out == sorted(["[1, 2]", "[3.5, 4.5]", "[5, 6]"])


def test_bool_and_string_columns_verbatim():
    df = pd.DataFrame({"b": [True, False], "s": ["x", None]})
    assert normalize(df, ["b", "s"]) == ["False|NULL", "True|x"]


def test_rows_and_columns_sorted():
    df = pd.DataFrame({"z": [2, 1], "a": ["b", "a"]})
    # caller passes sorted cols; rows come back sorted as strings
    assert normalize(df, ["a", "z"]) == ["a|1", "b|2"]

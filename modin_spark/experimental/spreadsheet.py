"""Spreadsheet widget bridge (reference: modin/experimental/spreadsheet/
general.py — thin wrappers over the optional ``modin_spreadsheet`` Jupyter
widget). The widget package is optional here exactly as in the reference:
importing these functions without it raises the same actionable error.
"""

from __future__ import annotations


def _require_widget():
    try:
        import modin_spreadsheet  # noqa: F401

        return modin_spreadsheet
    except ImportError as err:  # pragma: no cover - widget not in container
        raise ImportError(
            "modin_spreadsheet is required for spreadsheet support; "
            "install it to use from_dataframe/to_dataframe"
        ) from err


def from_dataframe(dataframe, show_toolbar=None, show_history=None,
                   precision=None, grid_options=None, column_options=None,
                   column_definitions=None, row_edit_callback=None):
    """Render an engine DataFrame in the spreadsheet widget (driver-side:
    the widget is an interactive notebook surface, same escape hatch as the
    reference's to_pandas handoff)."""
    ms = _require_widget()
    return ms.show_grid(dataframe.to_pandas(), show_toolbar, show_history,
                        precision, grid_options, column_options,
                        column_definitions, row_edit_callback)


def to_dataframe(spreadsheet):
    """Engine DataFrame from a spreadsheet widget's current state."""
    from modin_spark.pandas.io import from_pandas

    _require_widget()
    return from_pandas(spreadsheet.get_changed_df())

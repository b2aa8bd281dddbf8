"""Exploration UI — the reference's Streamlit app (``architxt/ui/
__init__.py:1-57``) over the Spark engine.

Run with ``streamlit run $(python -c 'import architxt_spark.ui as u;
print(u.__file__)')`` or ``python -m architxt_spark.ui`` (which execs
streamlit).  Streamlit itself is optional: every page is a plain
function over the engine APIs, reached through the
:func:`architxt_spark.ui.state.use_streamlit` seam, so the whole
surface is testable against a scripted fake in environments (like this
container) where streamlit is absent.
"""

from __future__ import annotations

from architxt_spark.ui.pages import (
    exporter,
    importer,
    labelling,
    simplification,
    visualizer,
)
from architxt_spark.ui.state import (
    clear_data,
    get_forest,
    get_metrics,
    get_schema,
    st,
    update_metrics,
    use_streamlit,
)

__all__ = [
    "clear_data",
    "exporter",
    "get_forest",
    "get_metrics",
    "get_schema",
    "importer",
    "labelling",
    "main",
    "render_metrics",
    "simplification",
    "update_metrics",
    "use_streamlit",
    "visualizer",
]

#: page registry (reference ``PAGES``, ``ui/__init__.py:8-18``)
PAGES = {
    "File": [("Import", importer), ("Export", exporter)],
    "Tools": [
        ("Visualize", visualizer),
        ("Labelling", labelling),
        ("Simplify", simplification),
    ],
}


def render_metrics() -> None:
    """The four header counters with deltas (reference
    ``render_metrics``, ``ui/__init__.py:21-27``)."""
    ui = st()
    prev, curr = get_metrics()
    cols = ui.columns(len(curr))
    for col, label in zip(cols, curr):
        col.metric(label, curr[label], delta=(curr[label] - prev[label]) or None)


def main() -> None:
    ui = st()
    ui.set_page_config(page_title="ArchiTXT Spark", layout="wide")
    ui.title("ArchiTXT Spark")

    with ui.sidebar:
        ui.header("Settings")
        ui.session_state["cache"] = ui.toggle("Enable Cache", value=True)

    render_metrics()
    if ui.button("Clear data"):
        clear_data()

    # flat navigation over the page registry: streamlit's st.navigation
    # when available, a selectbox fallback otherwise (keeps the fake
    # harness to the core widget API)
    flat = [(title, fn) for section in PAGES.values() for title, fn in section]
    if hasattr(ui, "navigation") and hasattr(ui, "Page"):
        pages = {
            section: [ui.Page(fn, title=title) for title, fn in entries]
            for section, entries in PAGES.items()
        }
        ui.navigation(pages, position="top").run()
    else:
        choice = ui.selectbox("Page", [t for t, _ in flat])
        dict(flat)[choice]()


if __name__ == "__main__":  # pragma: no cover — interactive entry point
    main()

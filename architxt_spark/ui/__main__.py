"""``python -m architxt_spark.ui`` — exec ``streamlit run`` on the app."""

import os
import sys


def run() -> None:
    try:
        from streamlit.web import cli  # type: ignore
    except ImportError as e:  # pragma: no cover — env-gated entry point
        raise SystemExit(
            "streamlit is not installed: pip install streamlit"
        ) from e
    app = os.path.join(os.path.dirname(__file__), "__init__.py")
    sys.argv = ["streamlit", "run", app]
    sys.exit(cli.main())


if __name__ == "__main__":
    run()

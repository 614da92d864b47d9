"""IPython stand-in for reference oracle runs.

The installed IPython is 9.x, which removed `IPython.core.display.display`
(still imported by the reference at `visualization.py:9`). The reference only
uses `display` for notebook output, a no-op in a headless oracle process, so
this shim shadows the real package entirely (it is first on PYTHONPATH) and
provides the two import paths the reference touches:
`IPython.display.display` (`main_deep_staple.py:50`) and
`IPython.core.display.display` (`visualization.py:9`).
"""

from . import core, display  # noqa: F401

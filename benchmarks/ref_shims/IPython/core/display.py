"""`IPython.core.display` shim (removed in IPython 9; reference
`visualization.py:9` still imports it)."""


def display(*args, **kwargs):  # pragma: no cover - notebook-output no-op
    return None

"""`IPython.display` shim — `display` is a headless no-op."""


def display(*args, **kwargs):  # pragma: no cover - notebook-output no-op
    return None

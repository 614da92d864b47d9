"""Empty `ants` stand-in: the reference imports it (`utils/nifti_sets.py:7`)
but never uses it (SURVEY §2.2)."""

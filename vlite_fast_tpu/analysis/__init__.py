from vlite_fast_tpu.analysis import baseband, localization  # noqa: F401

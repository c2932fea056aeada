from vlite_fast_tpu.models import baseband_dsp, synthesis, search, coadd  # noqa: F401

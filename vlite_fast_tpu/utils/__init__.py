from vlite_fast_tpu.utils import vdif, sigproc  # noqa: F401

from vlite_fast_tpu.runtime import trigger, control, capture, dumper  # noqa: F401


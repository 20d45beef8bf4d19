"""Model zoo. See tpgsr_tpu.models.registry for the --arch dispatch table."""

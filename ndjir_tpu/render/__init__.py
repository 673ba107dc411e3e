from ndjir_tpu.render import loss, renderer, sampler  # noqa: F401

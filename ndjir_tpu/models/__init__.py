from ndjir_tpu.models import brdf, fields  # noqa: F401

from egotap_tpu.core import skeleton, camera  # noqa: F401

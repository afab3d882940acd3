from maskedsst_tpu.utils.tracking import Tracker, Throughput  # noqa: F401

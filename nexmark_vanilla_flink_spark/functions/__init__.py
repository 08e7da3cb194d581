from .time import bucket_start_s, epoch_s, NS_PER_SEC  # noqa: F401

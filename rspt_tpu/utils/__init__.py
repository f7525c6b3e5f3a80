from .metrics import compression_ratio, prdn

from .lake import Lake, iceberg_available

__all__ = ["Lake", "iceberg_available"]

from .detsql import (
    DUCK,
    SPARK,
    Dialect,
    DuckDialect,
    charge,
    davg,
    dec2,
    disc_price,
    dsum,
    dsum_dec,
)

__all__ = [
    "DUCK",
    "SPARK",
    "Dialect",
    "DuckDialect",
    "charge",
    "davg",
    "dec2",
    "disc_price",
    "dsum",
    "dsum_dec",
]

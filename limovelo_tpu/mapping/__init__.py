from .hashgrid import (
    EMPTY_KEY,
    TOMBSTONE_KEY,
    GridParams,
    HashGridMap,
    insert,
    knn,
    make_map,
    prune,
)

__all__ = [
    "EMPTY_KEY",
    "TOMBSTONE_KEY",
    "GridParams",
    "HashGridMap",
    "insert",
    "knn",
    "make_map",
    "prune",
]

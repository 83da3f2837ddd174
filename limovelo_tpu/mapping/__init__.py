from .hashgrid import EMPTY_KEY, GridParams, HashGridMap, insert, knn, make_map

__all__ = ["EMPTY_KEY", "GridParams", "HashGridMap", "insert", "knn", "make_map"]

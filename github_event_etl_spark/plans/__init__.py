from .catalog import QuerySpec, all_specs, get_spec, oracle_map, query, query_map

__all__ = ["QuerySpec", "all_specs", "get_spec", "oracle_map", "query", "query_map"]

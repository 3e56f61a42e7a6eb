"""The drop-in compat module must expose exactly the reference's public
surface (12 functions, /root/reference/levi/__init__.py) plus the table
handle, and the callables must be the real implementations."""

from levi_spark import api


def test_all_reference_names_present():
    ref_names = {
        "skipped_stats", "filter_to_sql", "filters_to_sql",
        "latest_version", "delta_file_sizes", "str_to_bytes",
        "boundary_parser", "updated_partitions", "kill_duplicates",
        "type_2_scd_upsert", "drop_duplicates", "drop_duplicates_pkey",
    }
    assert ref_names < set(api.__all__)
    for n in ref_names:
        assert callable(getattr(api, n)), n


def test_scalar_functions_work_via_api():
    assert api.str_to_bytes("1 KB") == 1000
    lo, hi = api.boundary_parser("0 B -> 1 KB")
    assert (lo, hi) == (0, 1000)

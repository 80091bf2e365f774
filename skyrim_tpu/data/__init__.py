from skyrim_tpu.data.ic import (  # noqa: F401
    ICSource,
    FileSource,
    SyntheticSource,
    get_data_source,
    get_ic,
)

from skyrim_tpu.io.save import (  # noqa: F401
    SaveConfig,
    generate_forecast_id,
    generate_filename,
    save_forecast,
    load_forecast,
    read_forecast,
)
from skyrim_tpu.io.netcdf import write_netcdf, read_netcdf  # noqa: F401
from skyrim_tpu.io.zarrlite import ZarrStore, write_zarr, read_zarr  # noqa: F401

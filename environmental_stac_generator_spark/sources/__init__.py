"""Sources: NetCDF/raster/file scans (SURVEY §2.1)."""

"""Distributed operators: spatial joins, raster algebra, focal/zonal ops."""

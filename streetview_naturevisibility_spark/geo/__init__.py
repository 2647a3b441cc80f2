"""Pure-math geospatial kernels: web-mercator XYZ tiling (native Column
expressions), packed cell ids, UTM/WGS84 projection (NumPy Krüger
series), and NumPy polygon/linestring kernels for Arrow UDFs."""

from soillib_tpu.io.tiff import tiff
from soillib_tpu.io.geotiff import geotiff, geotiff_meta
from soillib_tpu.io.mesh import mesh
from soillib_tpu.io.checkpoint import zip_save, zip_load, save_checkpoint, load_checkpoint

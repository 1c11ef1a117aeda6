from .fatcube import (FatcubeMap, CubemapShell, decode_fatcube,
                      encode_fatcube, load_all_fatcubes, load_fatcube,
                      maps_match_bits, save_fatcube)
from .material import ModalMaterial, read_material, write_material
from .meta import (ModelPaths, list_dir_files, read_freq_threshold, read_meta,
                   resolve_model_dir, write_meta)
from .mode_data import ModeData, read_modes, write_modes
from .objmesh import icosphere, per_vertex_normals, read_obj, write_obj

from .paths import dataset_root, task_paths
from .preprocess import read_images, load_image, shuffle_data, decode_image
from .resolvers import (
    get_celebA_files,
    get_edge2photo_files,
    get_facescrub_files,
    get_custom_data,
    get_cars,
    get_chairs,
    get_faces_3d,
    get_task_data,
)
from .pipeline import PrefetchLoader, synthetic_pair

__all__ = [
    "dataset_root",
    "task_paths",
    "read_images",
    "load_image",
    "shuffle_data",
    "decode_image",
    "get_celebA_files",
    "get_edge2photo_files",
    "get_facescrub_files",
    "get_custom_data",
    "get_cars",
    "get_chairs",
    "get_faces_3d",
    "get_task_data",
    "PrefetchLoader",
    "synthetic_pair",
]

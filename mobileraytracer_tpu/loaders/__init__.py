from .obj import load_obj_scene  # noqa: F401
from .cam import load_camera_file  # noqa: F401

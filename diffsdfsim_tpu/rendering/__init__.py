from .raymarch import PinholeCamera, render_depth_seg, get_pointcloud
from .recorder import Recorder3D

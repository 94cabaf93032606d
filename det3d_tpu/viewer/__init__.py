from det3d_tpu.viewer.render import BEVRenderer, render_scene  # noqa: F401
from det3d_tpu.viewer.app import SceneViewer  # noqa: F401

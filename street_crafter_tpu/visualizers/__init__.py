from .visualizer import Visualizer, save_image, save_video, depth_colormap

__all__ = ["Visualizer", "save_image", "save_video", "depth_colormap"]

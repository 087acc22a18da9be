from tpu_splat.viewer.network_gui import NetworkGUI, render_net_image, RENDER_MODES

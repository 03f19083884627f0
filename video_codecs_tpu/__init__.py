"""video_codecs_tpu — TPU-native HEVC/H.264 codec framework."""

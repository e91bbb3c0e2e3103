"""Drop-in compatibility namespace: `hippomm.*` module paths (the reference's
public surface) backed by the TPU-native hippomm_tpu implementation."""

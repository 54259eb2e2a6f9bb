from dpot_tpu.native.build import get_library, native_available

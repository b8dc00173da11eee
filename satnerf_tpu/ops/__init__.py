"""Host-side native ops (C++ via ctypes with numpy fallbacks) and Pallas
device kernels."""

/* System-library shim: point this include at the repo's canonical header
 * (stringzilla_tpu/native/tapecraft.h) or install it alongside
 * libtapecraft.so. */
#include "tapecraft.h"

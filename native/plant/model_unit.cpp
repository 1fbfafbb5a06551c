#include "model_indy7.inc"

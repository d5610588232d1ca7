#pragma once
#define DVBS2RX_API

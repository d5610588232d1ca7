// Minimal stand-in for gnuradio/logger.h so reference PL submodules link
// in the oracle harness without a GNU Radio installation.
#pragma once
#include <memory>
#include <string>

namespace gr {
struct _stub_logger {
    template <typename... A>
    void debug(A&&...)
    {
    }
};
typedef std::shared_ptr<_stub_logger> logger_ptr;
inline void
configure_default_loggers(logger_ptr& l, logger_ptr& d, const std::string&)
{
    l = std::make_shared<_stub_logger>();
    d = std::make_shared<_stub_logger>();
}
} // namespace gr

#ifndef GR_LOG_DEBUG
#define GR_LOG_DEBUG(...) \
    do {                  \
    } while (0)
#endif

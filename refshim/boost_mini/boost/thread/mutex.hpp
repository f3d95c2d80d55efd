#ifndef ROVACA_SHIM_BOOST_THREAD_MUTEX_HPP
#define ROVACA_SHIM_BOOST_THREAD_MUTEX_HPP
#include <mutex>
namespace boost { using mutex = std::mutex; }
#endif

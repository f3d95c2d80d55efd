// shim alias
#ifndef ROVACA_SHIM_BOOST_ASIO_HPP
#define ROVACA_SHIM_BOOST_ASIO_HPP
#include <boost/asio/thread_pool.hpp>
#endif

// The reference includes this header but never instantiates the queue.
#ifndef ROVACA_SHIM_BOOST_LOCKFREE_QUEUE_HPP
#define ROVACA_SHIM_BOOST_LOCKFREE_QUEUE_HPP
namespace boost { namespace lockfree { template <typename T> class queue; } }
#endif

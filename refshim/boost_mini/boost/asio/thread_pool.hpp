// Minimal boost::asio::thread_pool / boost::asio::post stand-in.
//
// The reference harness build (refshim/) compiles the reference's genuine
// calling code against these headers because boost is not available in this
// environment. Only the surface the reference uses is provided
// (reference: src/haplotypecaller/haplotypecaller.cpp:97 thread_pool(n),
// asio::post(pool, fn), pool.join()). Execution semantics match: a fixed
// pool of N worker threads draining a FIFO queue; join() waits for all
// posted work then stops the workers.
#ifndef ROVACA_SHIM_BOOST_ASIO_THREAD_POOL_HPP
#define ROVACA_SHIM_BOOST_ASIO_THREAD_POOL_HPP

#include <condition_variable>
#include <cstddef>
#include <deque>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace boost {
namespace asio {

class thread_pool {
public:
    explicit thread_pool(std::size_t n) : stop_(false), pending_(0)
    {
        if (n == 0) n = 1;
        workers_.reserve(n);
        for (std::size_t i = 0; i < n; ++i) {
            workers_.emplace_back([this] { worker_loop(); });
        }
    }

    thread_pool(const thread_pool&) = delete;
    thread_pool& operator=(const thread_pool&) = delete;

    ~thread_pool() { join(); }

    void submit(std::function<void()> fn)
    {
        {
            std::lock_guard<std::mutex> lk(mu_);
            queue_.push_back(std::move(fn));
            ++pending_;
        }
        cv_.notify_one();
    }

    // boost: join() blocks until all outstanding work completes, then the
    // pool threads exit.
    void join()
    {
        {
            std::unique_lock<std::mutex> lk(mu_);
            done_cv_.wait(lk, [this] { return pending_ == 0; });
            stop_ = true;
        }
        cv_.notify_all();
        for (auto& t : workers_) {
            if (t.joinable()) t.join();
        }
        workers_.clear();
    }

    void stop() { join(); }

private:
    void worker_loop()
    {
        for (;;) {
            std::function<void()> fn;
            {
                std::unique_lock<std::mutex> lk(mu_);
                cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
                if (queue_.empty()) {
                    if (stop_) return;
                    continue;
                }
                fn = std::move(queue_.front());
                queue_.pop_front();
            }
            fn();
            {
                std::lock_guard<std::mutex> lk(mu_);
                if (--pending_ == 0) done_cv_.notify_all();
            }
        }
    }

    std::mutex mu_;
    std::condition_variable cv_, done_cv_;
    std::deque<std::function<void()>> queue_;
    std::vector<std::thread> workers_;
    bool stop_;
    std::size_t pending_;
};

template <typename F>
inline void post(thread_pool& pool, F&& fn)
{
    pool.submit(std::function<void()>(std::forward<F>(fn)));
}

}  // namespace asio
}  // namespace boost

#endif

// Minimal boost::program_options stand-in for the reference harness build.
//
// Implements exactly the surface used by the reference CLI
// (reference: src/rovaca_tool_args.h:178-248): options_description with
// "long,S" option names, value<T>() with required()/multitoken()/
// default_value()/notifier(), bool_switch, variables_map::count/[].as<T>(),
// store(parse_command_line(...)), notify(), po::error.
//
// Semantics preserved: defaults bound at parse setup; notifiers run at
// notify() for present-or-defaulted options; required options missing from
// the command line throw po::error at notify(); multitoken consumes
// following tokens until the next '-'-prefixed token; bool_switch consumes
// no token and stores its implicit value; a leading non-dash token (the
// tool name) is skipped, matching the working `rovaca HaplotypeCaller ...`
// invocation.
#ifndef ROVACA_SHIM_BOOST_PROGRAM_OPTIONS_HPP
#define ROVACA_SHIM_BOOST_PROGRAM_OPTIONS_HPP

#include <any>
#include <functional>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace boost {
namespace program_options {

class error : public std::runtime_error {
public:
    explicit error(const std::string& msg) : std::runtime_error(msg) {}
};

namespace shim_detail {

template <typename T>
inline T parse_token(const std::string& tok)
{
    std::istringstream is(tok);
    T out{};
    is >> out;
    if (is.fail()) throw error("invalid option value: " + tok);
    return out;
}

template <>
inline std::string parse_token<std::string>(const std::string& tok)
{
    return tok;
}

}  // namespace shim_detail

class value_semantic {
public:
    virtual ~value_semantic() = default;
    virtual bool is_switch() const = 0;
    virtual bool is_multitoken() const = 0;
    virtual bool is_required() const = 0;
    virtual bool has_default() const = 0;
    // parse the given tokens; returns the stored std::any
    virtual std::any parse(const std::vector<std::string>& tokens) const = 0;
    virtual std::any default_any() const = 0;
    virtual void run_notifier(const std::any& v) const = 0;
};

template <typename T>
class typed_value : public value_semantic {
public:
    explicit typed_value(T* bound) : bound_(bound) {}

    typed_value* required()
    {
        required_ = true;
        return this;
    }
    typed_value* multitoken()
    {
        multitoken_ = true;
        return this;
    }
    typed_value* default_value(const T& v)
    {
        default_ = v;
        has_default_ = true;
        if (bound_) *bound_ = v;
        return this;
    }
    typed_value* implicit_value(const T& v)
    {
        implicit_ = v;
        has_implicit_ = true;
        return this;
    }
    typed_value* notifier(std::function<void(const T&)> fn)
    {
        notifier_ = std::move(fn);
        return this;
    }

    bool is_switch() const override { return false; }
    bool is_multitoken() const override { return multitoken_; }
    bool is_required() const override { return required_; }
    bool has_default() const override { return has_default_; }

    std::any parse(const std::vector<std::string>& tokens) const override
    {
        T v = parse_tokens(tokens, static_cast<const T*>(nullptr));
        if (bound_) *bound_ = v;
        return std::any(v);
    }

    std::any default_any() const override
    {
        return has_default_ ? std::any(default_) : std::any();
    }

    void run_notifier(const std::any& v) const override
    {
        if (notifier_ && v.has_value()) notifier_(std::any_cast<const T&>(v));
    }

protected:
    template <typename U>
    T parse_tokens(const std::vector<std::string>& tokens, const U*) const
    {
        if (tokens.empty()) throw error("option requires a value");
        return shim_detail::parse_token<T>(tokens.front());
    }
    template <typename U>
    T parse_tokens(const std::vector<std::string>& tokens,
                   const std::vector<U>*) const
    {
        T out{};
        for (const auto& tok : tokens)
            out.push_back(shim_detail::parse_token<U>(tok));
        return out;
    }

    T* bound_;
    T default_{}, implicit_{};
    bool required_ = false, multitoken_ = false;
    bool has_default_ = false, has_implicit_ = false;
    std::function<void(const T&)> notifier_;
};

class bool_switch_value : public typed_value<bool> {
public:
    explicit bool_switch_value(bool* bound) : typed_value<bool>(bound) {}
    bool is_switch() const override { return true; }
    std::any parse(const std::vector<std::string>&) const override
    {
        bool v = has_implicit_ ? implicit_ : true;
        if (bound_) *bound_ = v;
        return std::any(v);
    }
};

template <typename T>
inline typed_value<T>* value()
{
    return new typed_value<T>(nullptr);
}
template <typename T>
inline typed_value<T>* value(T* bound)
{
    return new typed_value<T>(bound);
}
inline bool_switch_value* bool_switch(bool* bound)
{
    return new bool_switch_value(bound);
}

struct option_info {
    std::string long_name;
    std::string short_name;  // single char or empty
    std::shared_ptr<value_semantic> semantic;  // null for flag-only (help)
    std::string description;
};

class options_description;

class options_adder {
public:
    explicit options_adder(options_description* owner) : owner_(owner) {}
    options_adder& operator()(const char* name, const char* desc);
    options_adder& operator()(const char* name, value_semantic* sem,
                              const char* desc);

private:
    options_description* owner_;
};

class options_description {
public:
    explicit options_description(const std::string& caption = "")
        : caption_(caption)
    {
    }

    options_adder add_options() { return options_adder(this); }

    options_description& add(const options_description& other)
    {
        for (const auto& o : other.options_) options_.push_back(o);
        return *this;
    }

    void add_option(const char* name, value_semantic* sem, const char* desc)
    {
        option_info info;
        std::string n(name);
        auto comma = n.find(',');
        if (comma == std::string::npos) {
            info.long_name = n;
        } else {
            info.long_name = n.substr(0, comma);
            info.short_name = n.substr(comma + 1);
        }
        info.semantic.reset(sem);
        info.description = desc;
        options_.push_back(std::move(info));
    }

    const std::vector<option_info>& options() const { return options_; }

    const option_info* find(const std::string& token) const
    {
        // token is "--long" or "-S"
        if (token.size() >= 3 && token[0] == '-' && token[1] == '-') {
            std::string long_name = token.substr(2);
            for (const auto& o : options_)
                if (o.long_name == long_name) return &o;
        } else if (token.size() == 2 && token[0] == '-') {
            std::string short_name = token.substr(1);
            for (const auto& o : options_)
                if (o.short_name == short_name) return &o;
        }
        return nullptr;
    }

private:
    std::string caption_;
    std::vector<option_info> options_;
};

inline options_adder& options_adder::operator()(const char* name,
                                                const char* desc)
{
    owner_->add_option(name, nullptr, desc);
    return *this;
}
inline options_adder& options_adder::operator()(const char* name,
                                                value_semantic* sem,
                                                const char* desc)
{
    owner_->add_option(name, sem, desc);
    return *this;
}

class variable_value {
public:
    variable_value() = default;
    explicit variable_value(std::any v) : value_(std::move(v)) {}
    template <typename T>
    const T& as() const
    {
        return std::any_cast<const T&>(value_);
    }
    bool empty() const { return !value_.has_value(); }
    const std::any& raw() const { return value_; }

private:
    std::any value_;
};

struct parsed_options {
    const options_description* desc = nullptr;
    // (option, stored value, given on the command line?)
    std::vector<std::pair<const option_info*, std::any>> values;
};

class variables_map {
public:
    std::size_t count(const std::string& name) const
    {
        return values_.count(name);
    }
    const variable_value& operator[](const std::string& name) const
    {
        static const variable_value empty;
        auto it = values_.find(name);
        return it == values_.end() ? empty : it->second;
    }

    // shim internals
    void shim_set(const std::string& name, std::any v)
    {
        values_[name] = variable_value(std::move(v));
    }
    void shim_attach(const parsed_options& parsed) { parsed_ = parsed; }
    const parsed_options& shim_parsed() const { return parsed_; }

private:
    std::map<std::string, variable_value> values_;
    parsed_options parsed_;
};

inline parsed_options parse_command_line(int argc, char* const argv[],
                                         const options_description& desc)
{
    parsed_options out;
    out.desc = &desc;
    std::map<const option_info*, std::vector<std::string>> multi_tokens;
    int i = 1;
    // skip the bare tool-name token (e.g. "HaplotypeCaller")
    if (i < argc && argv[i][0] != '-') ++i;
    for (; i < argc; ++i) {
        std::string tok(argv[i]);
        if (tok.empty() || tok[0] != '-')
            throw error("unexpected positional argument: " + tok);
        const option_info* opt = desc.find(tok);
        if (!opt) throw error("unrecognised option: " + tok);
        if (!opt->semantic) {  // flag like --help/--version
            out.values.emplace_back(opt, std::any(true));
            continue;
        }
        if (opt->semantic->is_switch()) {
            out.values.emplace_back(opt,
                                    opt->semantic->parse({}));
            continue;
        }
        std::vector<std::string> toks;
        while (i + 1 < argc && argv[i + 1][0] != '-') {
            toks.emplace_back(argv[++i]);
            if (!opt->semantic->is_multitoken()) break;
        }
        if (toks.empty()) throw error("option " + tok + " requires a value");
        if (opt->semantic->is_multitoken()) {
            // real boost accumulates repeated occurrences of a
            // vector-valued option (-I a.bam -I b.bam) into ONE vector;
            // coalesce the tokens and re-parse the combined list
            for (auto& [prev_opt, prev_val] : out.values) {
                if (prev_opt == opt) {
                    std::vector<std::string>& acc = multi_tokens[opt];
                    acc.insert(acc.end(), toks.begin(), toks.end());
                    prev_val = opt->semantic->parse(acc);
                    goto next_arg;
                }
            }
            multi_tokens[opt] = toks;
        }
        out.values.emplace_back(opt, opt->semantic->parse(toks));
    next_arg:;
    }
    return out;
}

inline void store(const parsed_options& parsed, variables_map& vm)
{
    for (const auto& [opt, value] : parsed.values)
        vm.shim_set(opt->long_name, value);
    vm.shim_attach(parsed);
}

inline void notify(variables_map& vm)
{
    const parsed_options& parsed = vm.shim_parsed();
    if (!parsed.desc) return;
    for (const auto& opt : parsed.desc->options()) {
        if (!opt.semantic) continue;
        bool given = vm.count(opt.long_name) != 0;
        if (!given) {
            if (opt.semantic->is_required())
                throw error("missing required option: --" + opt.long_name);
            if (opt.semantic->has_default())
                opt.semantic->run_notifier(opt.semantic->default_any());
            continue;
        }
        opt.semantic->run_notifier(vm[opt.long_name].raw());
    }
}

}  // namespace program_options
}  // namespace boost

#endif

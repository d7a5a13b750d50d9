// Minimal drop-in replacement for the slice of boost::program_options used by
// ribbit.cpp (options_description with chained add_options(), variables_map,
// parse_command_line/store/notify, value<T>(), count(), as<T>()).
// Written from scratch for the golden-parity oracle build; NOT derived from boost.
#ifndef ORACLE_BOOST_PROGRAM_OPTIONS_HPP
#define ORACLE_BOOST_PROGRAM_OPTIONS_HPP

#include <string>
#include <vector>
#include <map>
#include <iostream>
#include <stdexcept>
#include <cstdlib>
// transitively provided by the real boost headers and relied on by ribbit.cpp
#include <algorithm>
#include <cmath>

namespace boost { namespace program_options {

struct value_semantic {
    bool takes_value;
    value_semantic(bool tv) : takes_value(tv) {}
};

template <typename T>
inline const value_semantic* value() {
    static value_semantic v(true);
    return &v;
}

struct option_info {
    std::string long_name;
    std::string short_name;   // may be empty
    bool takes_value;
    std::string description;
};

class options_description;

class options_adder {
    options_description* desc_;
public:
    explicit options_adder(options_description* d) : desc_(d) {}
    options_adder& operator()(const char* name, const char* description);
    options_adder& operator()(const char* name, const value_semantic* sem, const char* description);
};

class options_description {
public:
    std::string caption;
    std::vector<option_info> options;

    explicit options_description(const std::string& cap) : caption(cap) {}

    options_adder add_options() { return options_adder(this); }

    void add(const char* name, bool takes_value, const char* description) {
        option_info oi;
        std::string n(name);
        size_t comma = n.find(',');
        if (comma != std::string::npos) {
            oi.long_name = n.substr(0, comma);
            oi.short_name = n.substr(comma + 1);
        } else {
            oi.long_name = n;
        }
        oi.takes_value = takes_value;
        oi.description = description;
        options.push_back(oi);
    }

    const option_info* find_long(const std::string& name) const {
        for (const auto& o : options) if (o.long_name == name) return &o;
        return nullptr;
    }
    const option_info* find_short(const std::string& name) const {
        for (const auto& o : options) if (o.short_name == name) return &o;
        return nullptr;
    }

    friend std::ostream& operator<<(std::ostream& os, const options_description& d) {
        os << d.caption << "\n";
        for (const auto& o : d.options) {
            os << "  --" << o.long_name;
            if (!o.short_name.empty()) os << " [ -" << o.short_name << " ]";
            if (o.takes_value) os << " arg";
            os << "\t" << o.description << "\n";
        }
        return os;
    }
};

inline options_adder& options_adder::operator()(const char* name, const char* description) {
    desc_->add(name, false, description);
    return *this;
}
inline options_adder& options_adder::operator()(const char* name, const value_semantic* sem, const char* description) {
    desc_->add(name, sem->takes_value, description);
    return *this;
}

class variable_value {
    std::string raw_;
    bool has_value_;
public:
    variable_value() : has_value_(false) {}
    explicit variable_value(const std::string& raw) : raw_(raw), has_value_(true) {}

    template <typename T> T as() const;
};

template <> inline std::string variable_value::as<std::string>() const { return raw_; }
template <> inline int variable_value::as<int>() const { return std::atoi(raw_.c_str()); }
template <> inline float variable_value::as<float>() const { return (float)std::atof(raw_.c_str()); }
template <> inline double variable_value::as<double>() const { return std::atof(raw_.c_str()); }

class variables_map {
    std::map<std::string, variable_value> values_;
public:
    size_t count(const std::string& name) const { return values_.count(name); }
    const variable_value& operator[](const std::string& name) const {
        static variable_value empty;
        auto it = values_.find(name);
        return it == values_.end() ? empty : it->second;
    }
    void insert_value(const std::string& name, const std::string& raw) {
        values_[name] = variable_value(raw);
    }
};

struct parsed_options {
    std::vector<std::pair<std::string, std::string>> entries;
};

inline parsed_options parse_command_line(int argc, char* argv[], const options_description& desc) {
    parsed_options result;
    for (int i = 1; i < argc; ++i) {
        std::string arg(argv[i]);
        const option_info* oi = nullptr;
        std::string inline_value;
        bool has_inline = false;

        if (arg.rfind("--", 0) == 0) {
            std::string name = arg.substr(2);
            size_t eq = name.find('=');
            if (eq != std::string::npos) {
                inline_value = name.substr(eq + 1);
                name = name.substr(0, eq);
                has_inline = true;
            }
            oi = desc.find_long(name);
            if (!oi) throw std::runtime_error("unrecognised option '" + arg + "'");
        } else if (arg.size() >= 2 && arg[0] == '-') {
            std::string name = arg.substr(1, 1);
            oi = desc.find_short(name);
            if (!oi) throw std::runtime_error("unrecognised option '" + arg + "'");
            if (arg.size() > 2) { inline_value = arg.substr(2); has_inline = true; }
        } else {
            throw std::runtime_error("unexpected positional argument '" + arg + "'");
        }

        std::string value;
        if (oi->takes_value) {
            if (has_inline) value = inline_value;
            else if (i + 1 < argc) value = argv[++i];
            else throw std::runtime_error("option '" + oi->long_name + "' requires an argument");
        }
        result.entries.push_back({oi->long_name, value});
    }
    return result;
}

inline void store(const parsed_options& parsed, variables_map& vm) {
    for (const auto& e : parsed.entries) vm.insert_value(e.first, e.second);
}

inline void notify(variables_map&) {}

}} // namespace boost::program_options

#endif
